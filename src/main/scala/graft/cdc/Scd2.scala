package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history from an ordered changelog:
  * every non-delete event becomes one version row with a
  * `[valid_from, valid_to)` interval in log order, deletes close the
  * preceding version without emitting a row, and the open interval (if
  * any) is the current version. This is the temporal-table complement of
  * the MERGE snapshot (q50 keeps only survivors; SCD2 keeps the full
  * lineage of every key) — the dbt analog is a `snapshots/` model with
  * `strategy='check'` over the same incremental source the reference
  * loads monthly (dags/nyc_taxi_sync_dag.py:40-55).
  *
  * Scale shape: ONE hash shuffle on the key and one ordered pass per
  * partition — both window functions (the duplicate collapse and the
  * interval close) share the same `partitionBy(key) orderBy(ord)` spec,
  * so Catalyst plans a single Exchange+Sort feeding two Window nodes
  * (asserted in Scd2Spec). No self-join of the log against itself, which
  * is the naive formulation and is O(versions²) per key at 10^10 events.
  */
object Scd2 {

  /** Build the SCD2 interval table.
    *
    * Contract on `changes`: `ordCol` (e.g. an LSN) uniquely identifies an
    * event within a key, and a re-delivered event is byte-identical to
    * the original (the at-least-once transport of IngestJob) — duplicate
    * (key, ord) rows collapse to one arbitrary-but-identical winner.
    * `opCol` holds I/U (version rows) or D (closes the prior version).
    *
    * Output: the input columns minus `opCol`, with `ordCol` renamed to
    * `valid_from_<ordCol>`, plus `valid_to_<ordCol>` (null = open) and
    * `is_current`.
    */
  def fromChangelog(changes: DataFrame, keyCols: Seq[String], ordCol: String,
      opCol: String = "op", deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(ordCol))
    changes
      // collapse at-least-once re-deliveries: same key + same ord is the
      // same event (see contract) — a lag over the shared window spec
      // instead of dropDuplicates keeps this on the single key shuffle
      .withColumn("__prev_ord", lag(col(ordCol), 1).over(w))
      .filter(col("__prev_ord").isNull || col("__prev_ord") =!= col(ordCol))
      .drop("__prev_ord")
      .withColumn(s"valid_to_$ordCol", lead(col(ordCol), 1).over(w))
      .filter(col(opCol) =!= deleteOp)
      .withColumn("is_current", col(s"valid_to_$ordCol").isNull)
      .withColumnRenamed(ordCol, s"valid_from_$ordCol")
      .drop(opCol)
  }

  /** Incrementally fold one change batch into an existing SCD2 table:
    * closed history passes through untouched (append-only), each touched
    * key's OPEN row closes at the batch's first event for that key, and
    * the batch's own versions come from [[fromChangelog]] on the batch
    * alone. Per-epoch cost is O(batch + open rows), never O(history) —
    * the full-rebuild alternative rewrites the entire temporal table
    * every epoch, which at a 10^10-event log is the difference between a
    * streaming maintenance job and a nightly batch.
    *
    * Contract (matches the ingest LSN watermark): every ord in `changes`
    * is strictly greater than every ord already in `prior` — epochs
    * arrive in order, and below-watermark events were already dropped by
    * the ingest dedup. Equivalence with the full rebuild under any epoch
    * split is law-tested in Scd2Spec.
    */
  def merge(prior: DataFrame, changes: DataFrame, keyCols: Seq[String],
      ordCol: String, opCol: String = "op", deleteOp: String = "D"): DataFrame = {
    val from = s"valid_from_$ordCol"
    val to = s"valid_to_$ordCol"
    // first event per touched key closes that key's open interval; the
    // key set of one epoch is bounded by batch size — typically tiny next
    // to the open set — so BROADCAST it explicitly: at 10^9 open rows an
    // AQE-missed sort-merge fallback would shuffle the entire open set to
    // close a handful of keys. (A pathological epoch-sized batch should be
    // split upstream, not absorbed by a silent full shuffle here.)
    val firstOrd = broadcast(changes
      .groupBy(keyCols.map(col): _*)
      .agg(min(col(ordCol)).as("__first_ord")))
    val closed = prior
      .join(firstOrd, keyCols, "left")
      .withColumn(to,
        when(col("is_current") && col("__first_ord").isNotNull, col("__first_ord"))
          .otherwise(col(to)))
      .withColumn("is_current", col("is_current") && col("__first_ord").isNull)
      .drop("__first_ord")
    closed.unionByName(fromChangelog(changes, keyCols, ordCol, opCol, deleteOp))
  }

  /** Fold an ordered sequence of epoch batches through [[merge]], with
    * lineage truncation every `checkpointEvery` epochs: each merge stacks
    * a union + join on the prior plan, so an unbounded fold (a streaming
    * maintainer looping for months) grows an O(epochs)-deep logical plan
    * that eventually drowns the driver in analysis time. `localCheckpoint`
    * materializes the fold state and cuts the lineage — the batch analog
    * of [[Scd2Stream]]'s per-epoch parquet materialization. Same epoch
    * contract as [[merge]] (ords strictly increase across batches).
    */
  def foldEpochs(epochs: Seq[DataFrame], keyCols: Seq[String], ordCol: String,
      opCol: String = "op", deleteOp: String = "D",
      checkpointEvery: Int = 8): DataFrame = {
    require(epochs.nonEmpty, "foldEpochs needs at least one epoch batch")
    epochs.zipWithIndex.foldLeft(Option.empty[DataFrame]) {
      case (prior, (batch, i)) =>
        val next = prior match {
          case None => fromChangelog(batch, keyCols, ordCol, opCol, deleteOp)
          case Some(p) => merge(p, batch, keyCols, ordCol, opCol, deleteOp)
        }
        Some(
          if (checkpointEvery > 0 && (i + 1) % checkpointEvery == 0 &&
              i + 1 < epochs.size) next.localCheckpoint()
          else next)
    }.get
  }
}
