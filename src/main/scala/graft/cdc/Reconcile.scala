package graft.cdc

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** The shared last-LSN-wins reconcile operator: one salted shuffle on
  * hash(doc_id), a per-partition sort, and a streaming first-row-wins scan.
  *
  * Input columns: payload… + `lsn` + `op`. Output: the winning row per
  * doc_id with delete winners dropped, plus the `_bucket` column.
  *
  * Why sort-based instead of max_by(struct) aggregation: the aggregation
  * form materializes the full payload struct through hash-agg operators
  * (measured 253 task-seconds + 150 s GC for an epoch the sort form does
  * in a fraction) — sorting compact UnsafeRows and streaming over them
  * allocates almost nothing.
  *
  * Shuffle key = (bucket, hash(doc_id) % writeSplits): all rows of one doc
  * colocate (both parts are functions of doc_id), but a bucket spreads
  * over writeSplits tasks — without the salt, hashing numBuckets ids into
  * numBuckets partitions leaves ~1/3 of cores idle and gives stragglers
  * 2–3 buckets (balls-in-bins); it also caps what a zipf-hot key can pin
  * on one task. This is the north-rule "salted repartition on
  * hash(doc_id)".
  */
object Reconcile {

  case class Counters(
      upserts: LongAccumulator, deletes: LongAccumulator, rows: LongAccumulator)

  /** Rows-per-reduce-task target for the adaptive partition count: with
    * the ~100-400 B/row change-event payloads this engine shuffles, 2M
    * rows ≈ a few hundred MB per task — the guide's §2.2 partition-size
    * band. Only an upper-bound clamp ever derives from it (see below), so
    * a mis-estimate can cost balance, never correctness.
    */
  private val RowsPerTask = 2000000L

  def winners(
      spark: SparkSession,
      df: DataFrame,
      numBuckets: Int,
      writeSplits: Int,
      counters: Option[Counters] = None,
      rowsHint: Option[Long] = None): DataFrame = {

    val withBucket = df.withColumn("_bucket", SnapshotTable.bucketOf(col("doc_id"), numBuckets))
    // Partition count is over-provisioned 4x beyond the distinct
    // (bucket, salt) key count: hashing K keys into exactly K partitions
    // leaves ~1/e of them empty and gives the busiest task 3-4 keys'
    // worth of rows (balls-in-bins) — a 3-4x straggler tail on the one
    // shuffle this engine performs. With 4K partitions two keys rarely
    // collide, so the tail is ~1 key. Empty partitions cost microseconds
    // at cluster scale — but at thousands of buckets a KNOWN-tiny input
    // (manifest row counts, passed as rowsHint) would schedule thousands
    // of empty tasks per reconcile: clamp the count to what the data
    // volume supports (scale-ADAPTIVE, guide §2.2 — the provisioned count
    // still applies whenever the hint is absent or the input is large).
    val provisioned = numBuckets * writeSplits * 4
    val parts = rowsHint match {
      case Some(n) if n >= 0 =>
        val byData = math.max(writeSplits.toLong, n / RowsPerTask + 1)
        math.min(provisioned.toLong, byData).toInt
      case _ => provisioned
    }
    val arranged = withBucket
      .repartition(parts, col("_bucket"),
        pmod(xxhash64(col("doc_id"), lit(7L)), lit(writeSplits.toLong)))
      // 'U' > 'K' > 'I' > 'D' lexicographically — ties on lsn can only be
      // exact re-deliveries, where any winner carries the same payload
      .sortWithinPartitions(col("doc_id"), col("lsn").desc, col("op").desc)

    val schema = arranged.schema
    val docIdx = schema.fieldIndex("doc_id")
    val opIdx = schema.fieldIndex("op")

    arranged.mapPartitions { it =>
      var lastDoc: String = null
      it.filter { r =>
        val d = r.getString(docIdx)
        val isFirst = d != lastDoc
        lastDoc = d
        if (isFirst) {
          val op = r.getString(opIdx)
          if (op == Model.OpDelete) {
            counters.foreach(_.deletes.add(1)); false
          } else {
            counters.foreach { c =>
              c.rows.add(1)
              if (op != Model.OpKeep) c.upserts.add(1)
            }
            true
          }
        } else false
      }
    }(Encoders.row(schema))
  }
}
