package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Idempotent, key-partitioned MERGE of a change-event batch into a
  * [[SnapshotTable]] — the engine's core, replacing the reference's dbt
  * `incremental_strategy='merge'` (fct_trips.sql:1-13) executed by
  * Snowflake. Design per SURVEY.md §4.2/§4.3:
  *
  * Dedup is layered (each layer is sufficient for correctness; upper
  * layers exist to cut shuffle volume at scale):
  *   0. epoch fence — a (queryId, epochId) at or below the committed fence
  *      makes the whole merge a no-op (exactly-once under foreachBatch
  *      replay);
  *   1. broadcast min-LSN filter — per-source-partition applied watermarks
  *      embedded as a map literal drop already-applied events before any
  *      shuffle (source re-delivery, e.g. a re-shipped WAL suffix);
  *   2. salted two-phase last-LSN-wins — group by (doc_id, salt(lsn))
  *      then by doc_id, taking max_by(lsn). The salt bounds per-reducer
  *      fan-in for zipf-hot keys; hash partial aggregation additionally
  *      combines map-side, so a hot doc_id contributes at most
  *      (#tasks × #salts) rows to the shuffle instead of its raw count;
  *   3. row-level reconcile — surviving events are unioned with the live
  *      rows of only the touched buckets and resolved by max(lsn), so even
  *      an event that slipped past 0–2 can never regress a newer row.
  *
  * Deletes drop the row; 'I' and 'U' both upsert. Commit is one atomic
  * manifest swap; untouched buckets carry their files forward unchanged —
  * the rewrite is O(touched buckets), not O(table).
  */
object MergeEngine {

  case class MergeResult(applied: Boolean, metrics: Option[EpochMetrics], version: Long)

  /** Max epoch-metrics rows retained in the manifest (older epochs'
    * lineage is still implied by watermarks).
    */
  private val MetricsRetained = 4096

  def merge(
      spark: SparkSession,
      table: SnapshotTable,
      events: DataFrame,
      queryId: String,
      epochId: Long,
      saltBuckets: Int = 64): MergeResult = {

    val m = table.manifest.getOrElse(sys.error(s"table not initialized: ${table.root}"))

    // ── 0. epoch fence: replayed epoch → no-op ─────────────────────────
    if (m.fences.get(queryId).exists(_ >= epochId)) {
      return MergeResult(applied = false, None, m.version)
    }

    // ── schema evolution (additive / widening) ─────────────────────────
    val tableSchema = DataType.fromJson(m.currentSchemaJson).asInstanceOf[StructType]
    val payloadSchema = StructType(
      events.schema.fields.filterNot(f => Model.metaCols.contains(f.name.toLowerCase)))
    val newSchema = SnapshotTable.mergeSchemas(tableSchema, payloadSchema)
    val schemas = if (newSchema.json == tableSchema.json) m.schemas else m.schemas :+ newSchema.json
    val schemaId = schemas.size - 1
    val mPrime = m.copy(schemas = schemas)

    // ── 1. broadcast min-LSN watermark filter ──────────────────────────
    val wm: Map[Int, Long] = m.watermarks.map { case (k, v) => k.toInt -> v }
    val wmFloor: Column =
      if (wm.isEmpty) lit(Long.MinValue)
      else coalesce(element_at(typedLit(wm), col("partition")), lit(Long.MinValue))

    // One small stats job drives watermark advance, touched-bucket set and
    // the eventsIn/belowWatermark metrics (collect is O(partitions ×
    // buckets), driver-safe at any data scale).
    val statsRows = events
      .groupBy(
        col("partition"),
        SnapshotTable.bucketOf(col("doc_id"), m.numBuckets).as("_bucket"),
        (col("lsn") <= wmFloor).as("stale"))
      .agg(count(lit(1)).as("n"), max(col("lsn")).as("max_lsn"))
      .collect()

    val eventsIn = statsRows.map(_.getLong(3)).sum
    val belowWm = statsRows.filter(_.getBoolean(2)).map(_.getLong(3)).sum
    val touched: Seq[Int] = statsRows.filterNot(_.getBoolean(2)).map(_.getInt(1)).distinct.sorted.toSeq
    val newWatermarks: Map[String, Long] = {
      val advanced = statsRows.filterNot(_.getBoolean(2))
        .groupBy(_.getInt(0))
        .map { case (p, rows) => p.toString -> rows.map(_.getLong(4)).max }
      m.watermarks ++ advanced.map { case (k, v) =>
        k -> math.max(v, m.watermarks.getOrElse(k, Long.MinValue))
      }
    }

    if (touched.isEmpty) {
      // Nothing fresh: commit only the fence/watermark advance (cheap,
      // metadata-only) so a replay of this epoch stays a no-op.
      val metrics = EpochMetrics(queryId, epochId, eventsIn, belowWm, 0, 0, 0, 0, 0)
      val next = mPrime.copy(
        version = m.version + 1, parentVersion = m.version,
        fences = m.fences + (queryId -> epochId),
        watermarks = newWatermarks,
        metrics = (m.metrics :+ metrics).takeRight(MetricsRetained))
      table.commit(next)
      return MergeResult(applied = true, Some(metrics), next.version)
    }

    val fresh = events.filter(col("lsn") > wmFloor)

    // ── 2. salted two-phase last-LSN-wins dedup ────────────────────────
    val payloadCols = SnapshotTable.conformColumns(events.schema, newSchema)
    val ev = fresh.select(payloadCols ++ Seq(col("lsn"), col("op")): _*)
    val allCols = newSchema.fieldNames.toSeq ++ Seq("lsn", "op")
    val packed = struct(allCols.map(col): _*).as("e")
    val ord = struct(col("lsn"), col("op"))
    val phase1 = ev
      .withColumn("_salt", pmod(xxhash64(col("lsn")), lit(saltBuckets.toLong)))
      .groupBy(col("doc_id"), col("_salt"))
      .agg(max_by(packed, ord).as("e"))
    val staged = phase1
      .groupBy(col("doc_id"))
      .agg(max_by(col("e"), struct(col("e.lsn"), col("e.op"))).as("e"))
      .select(col("e.*"))

    val dedupObs = Observation(s"dedup-$epochId")
    val stagedObs = staged.observe(dedupObs, count(lit(1)).as("n"))

    // ── 3. reconcile against live rows of touched buckets only ─────────
    val liveEntries = m.files.filter(f => touched.contains(f.bucket))
    val live = table.readFiles(spark, mPrime, liveEntries)
    val liveU = live.select(
      newSchema.fieldNames.toSeq.map(col) ++
        Seq(col(Model.LsnCol).as("lsn"), lit("K").as("op")): _*)

    val winnersObs = Observation(s"winners-$epochId")
    val winners = stagedObs.unionByName(liveU)
      .groupBy(col("doc_id"))
      .agg(max_by(packed, ord).as("e"))
      .select(col("e.*"))
      .observe(
        winnersObs,
        count(when(col("op") === Model.OpDelete, 1)).as("deletes"),
        count(when(col("op") =!= Model.OpDelete, 1)).as("rows"))

    val out = winners
      .filter(col("op") =!= Model.OpDelete)
      .select(
        newSchema.fieldNames.toSeq.map(col) ++
          Seq(col("lsn").as(Model.LsnCol)): _*)
      .withColumn("_bucket", SnapshotTable.bucketOf(col("doc_id"), m.numBuckets))

    // ── write new bucket files (deterministic layout) ──────────────────
    val newVersion = m.version + 1
    val outDir = table.dataDir(newVersion)
    out
      .repartition(col("_bucket"), col("doc_id"))
      .sortWithinPartitions(col("_bucket"), col("doc_id"))
      .write
      .option("maxRecordsPerFile", 4000000)
      .partitionBy("_bucket")
      .mode("overwrite")
      .parquet(outDir.toString)

    val nStaged = dedupObs.get("n").asInstanceOf[Long]
    val nDeletes = winnersObs.get("deletes").asInstanceOf[Long]
    val nRows = winnersObs.get("rows").asInstanceOf[Long]
    val freshCount = eventsIn - belowWm

    val written = table.listBucketFiles(outDir)
    val newEntries = FileStats.entries(spark, written, schemaId)
    val carried = m.files.filterNot(f => touched.contains(f.bucket))
      // old files must be re-tagged only if schema evolved? No — schemaId
      // stays pointing at the schema they were written under.

    val metrics = EpochMetrics(
      queryId = queryId, epochId = epochId,
      eventsIn = eventsIn, belowWatermark = belowWm,
      collapsedInBatch = freshCount - nStaged,
      upserts = nStaged, deletes = nDeletes,
      rowsWritten = nRows, touchedBuckets = touched.size)

    val next = mPrime.copy(
      version = newVersion, parentVersion = m.version,
      files = carried ++ newEntries,
      fences = m.fences + (queryId -> epochId),
      watermarks = newWatermarks,
      metrics = (m.metrics :+ metrics).takeRight(MetricsRetained))

    // Re-check the fence immediately before publishing (defense against a
    // concurrent replayed writer; single-writer is the design contract).
    val latest = table.manifest.get
    require(latest.version == m.version,
      s"concurrent writer detected at ${table.root}: v${latest.version} != v${m.version}")
    table.commit(next)
    MergeResult(applied = true, Some(metrics), newVersion)
  }
}
