package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Idempotent, key-partitioned MERGE of a change-event batch into a
  * [[SnapshotTable]] — the engine's core, replacing the reference's dbt
  * `incremental_strategy='merge'` (fct_trips.sql:1-13) executed by
  * Snowflake. Design per SURVEY.md §4.2/§4.3:
  *
  * Dedup/reconcile layers (each alone is sufficient for correctness;
  * upper layers cut shuffle volume at scale):
  *   0. epoch fence — a (queryId, epochId) at or below the committed fence
  *      makes the whole merge a no-op (exactly-once under foreachBatch
  *      replay);
  *   1. broadcast min-LSN filter — per-source-partition applied watermarks
  *      embedded as a map literal drop already-applied events before any
  *      shuffle (source re-delivery, e.g. a re-shipped WAL suffix);
  *   2. (optional, for hot-key update storms) salted two-phase
  *      last-LSN-wins pre-combine: group by (doc_id, salt(lsn)) then by
  *      doc_id — map-side partial aggregation collapses a zipf-hot key to
  *      ≤ tasks × salts rows before the main shuffle. Off by default: for
  *      ordinary duplication rates its two extra shuffles cost more than
  *      they save;
  *   3. the [[Reconcile]] operator — ONE salted shuffle on hash(doc_id),
  *      per-partition sort, streaming first-row-wins. An event that
  *      slipped past 0–2 can never regress a newer row; deletes drop it.
  *
  * Two write modes:
  *   - MERGE-ON-READ (default): the batch alone is written into DELTA
  *     files (payload + _lsn + _op + _bucket, delete tombstones included)
  *     with a shuffle-free local sort on _bucket, so every delta file's
  *     footer bounds the bucket range it touches; readers and periodic
  *     [[compact]] runs apply [[Reconcile]] to the DIRTY buckets only
  *     (O(dirty buckets), not O(table)). Ingest cost is O(batch) — the
  *     table is never rewritten on the hot path, which is what survives a
  *     10^10-event log. Compaction safety relies on per-partition key
  *     affinity (a doc's events share a source partition), the same
  *     contract every log-compacted system assumes.
  *   - COPY-ON-WRITE: the classic eager variant — batch ∪ live rows of
  *     touched buckets reconcile and rewrite those buckets; reads stay
  *     plain scans. O(touched buckets) per epoch.
  *
  * 'I' and 'U' both upsert. Commit is one atomic manifest swap; untouched
  * buckets carry their files forward unchanged.
  */
object MergeEngine {

  val ModeMor = "mor"
  val ModeCow = "cow"

  case class MergeResult(applied: Boolean, metrics: Option[EpochMetrics], version: Long)

  /** Max epoch-metrics rows retained in the manifest (older epochs'
    * lineage is still implied by watermarks).
    */
  private val MetricsRetained = 4096

  private val timing = sys.env.get("GRAFT_MERGE_TIMING").contains("1")
  private def timed[A](label: String)(a: => A): A = {
    if (!timing) a
    else {
      val t0 = System.nanoTime()
      val r = a
      println(f"[merge-timing] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
  }

  /** Max automatic rebases after an optimistic-concurrency loss before
    * the ConcurrentCommitException propagates to the caller.
    */
  private val MaxRebases = 8

  /** Clustered base layout: one RANGE exchange on (_bucket, key) + local
    * sort before every base-file write, so a bucket's files cover
    * DISJOINT key subranges (Reconcile's write splits would otherwise
    * interleave the bucket's keys across tasks and every file would span
    * the whole range). The footer's key min/max then lands in the
    * manifest ([[FileEntry.minKey]]/maxKey) and a point lookup reads only
    * the one file per bucket whose range covers the key — O(1) files
    * instead of O(bucket files) — the standard lakehouse clustered-write
    * shape (Iceberg sort-order compaction + lower/upper bounds). Cost is
    * one extra exchange of exactly the rows being rewritten, paid only on
    * the rewrite-heavy COW/compact/purge paths, never on MOR ingest: a
    * table compacts each row once but serves point reads forever, so the
    * exchange amortizes to the better side at any scale.
    */
  private def clustered(df: DataFrame): DataFrame =
    df.repartitionByRange(col(Model.BucketCol), col(Model.KeyCol))
      .sortWithinPartitions(col(Model.BucketCol), col(Model.KeyCol))

  def merge(
      spark: SparkSession,
      table: SnapshotTable,
      events: DataFrame,
      queryId: String,
      epochId: Long,
      saltBuckets: Int = 64,
      saltedPreDedup: Boolean = false,
      writeSplits: Int = 4,
      mode: String = ModeMor,
      sortDeltas: Boolean = false): MergeResult =
    mergeImpl(spark, table, events, queryId, epochId, saltBuckets,
      saltedPreDedup, writeSplits, mode, sortDeltas, rebaseAttempt = 0)

  /** Everything [[mergeImpl]] derives from (manifest, batch) before any
    * write: fence check, schema evolution, the broadcast min-LSN filter's
    * stats job, watermark advances, and the staged (optionally
    * pre-combined) fresh rows. Shared by the MOR stage, the COW rewrite
    * and [[Wap]]'s write-audit-publish staging so the three paths cannot
    * drift semantically.
    */
  private final case class Prep(
      m: Manifest,
      mPrime: Manifest,
      newSchema: StructType,
      schemaId: Int,
      eventsIn: Long,
      belowWm: Long,
      freshCount: Long,
      freshDeletes: Long,
      touched: Seq[Int],
      wmAdvances: Map[String, Long],
      newWatermarks: Map[String, Long],
      staged: DataFrame)

  /** None = the epoch is at or below the committed fence (replay no-op). */
  private def prepare(
      table: SnapshotTable,
      events: DataFrame,
      queryId: String,
      epochId: Long,
      saltBuckets: Int,
      saltedPreDedup: Boolean): Option[Prep] = {

    val m = table.manifest.getOrElse(sys.error(s"table not initialized: ${table.root}"))

    // ── 0. epoch fence: replayed epoch → no-op ─────────────────────────
    if (m.fences.get(queryId).exists(_ >= epochId)) return None

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

    // One small stats job drives watermark advance, touched buckets and
    // epoch metrics (collect is O(partitions × buckets × 4), driver-safe
    // at any scale; scans only 4 columns).
    val statsRows = timed("stats-job")(events
      .groupBy(
        col("partition"),
        SnapshotTable.bucketOf(col("doc_id"), m.numBuckets).as("_bucket"),
        (col("lsn") <= wmFloor).as("stale"),
        (col("op") === Model.OpDelete).as("isdel"))
      .agg(count(lit(1)).as("n"), max(col("lsn")).as("max_lsn"))
      .collect())

    val eventsIn = statsRows.map(_.getLong(4)).sum
    val belowWm = statsRows.filter(_.getBoolean(2)).map(_.getLong(4)).sum
    val freshRows = statsRows.filterNot(_.getBoolean(2))
    val freshCount = eventsIn - belowWm
    val freshDeletes = freshRows.filter(_.getBoolean(3)).map(_.getLong(4)).sum
    val touched: Seq[Int] = freshRows.map(_.getInt(1)).distinct.sorted.toSeq
    // Per-partition LSN advances implied by THIS batch (merged against
    // whatever manifest the commit ultimately lands on — a rebase must
    // not regress a concurrent writer's watermarks).
    val wmAdvances: Map[String, Long] = freshRows.groupBy(_.getInt(0))
      .map { case (p, rows) => p.toString -> rows.map(_.getLong(5)).max }
    val newWatermarks: Map[String, Long] =
      m.watermarks ++ wmAdvances.map { case (k, v) =>
        k -> math.max(v, m.watermarks.getOrElse(k, Long.MinValue))
      }

    val fresh = events.filter(col("lsn") > wmFloor)
    val payloadCols = SnapshotTable.conformColumns(events.schema, newSchema)
    val ev0 = fresh.select(payloadCols ++ Seq(col("lsn"), col("op")): _*)

    // ── 2. optional salted pre-combine for hot-key storms ──────────────
    val staged = if (saltedPreDedup) {
      val allCols = newSchema.fieldNames.toSeq ++ Seq("lsn", "op")
      val packed = struct(allCols.map(col): _*).as("e")
      val ord = struct(col("lsn"), col("op"))
      ev0
        .withColumn("_salt", pmod(xxhash64(col("lsn")), lit(saltBuckets.toLong)))
        .groupBy(col("doc_id"), col("_salt"))
        .agg(max_by(packed, ord).as("e"))
        .groupBy(col("doc_id"))
        .agg(max_by(col("e"), struct(col("e.lsn"), col("e.op"))).as("e"))
        .select(col("e.*"))
    } else ev0

    Some(Prep(m, mPrime, newSchema, schemaId, eventsIn, belowWm, freshCount,
      freshDeletes, touched, wmAdvances, newWatermarks, staged))
  }

  /** Outcome of [[stageMor]]: delta files written (or nothing to write),
    * plus everything a later [[commitRebasing]] needs to publish them.
    * Until published, the files are INVISIBLE to every reader (no
    * manifest references them) — the write half of write-audit-publish.
    */
  private[cdc] sealed trait StageOutcome
  private[cdc] case object FenceCovered extends StageOutcome
  private[cdc] final case class StagedMor(
      entries: Seq[FileEntry],
      physicalSchema: StructType,
      wmAdvances: Map[String, Long],
      metric: EpochMetrics,
      dataDir: Option[java.nio.file.Path]) extends StageOutcome {
    def cleanup(): Unit = dataDir.foreach { d =>
      val _ = scala.util.Try(graft.util.Tables.deleteRecursively(d.toString))
    }
  }

  /** The MOR write WITHOUT the commit: stage the batch's delta files
    * against the current manifest and return the entries + metadata a
    * publish needs. [[merge]] publishes immediately; [[Wap]] audits the
    * staged state first. Empty `entries` = nothing fresh (metadata-only
    * fence/watermark advance on publish).
    */
  private[cdc] def stageMor(
      spark: SparkSession,
      table: SnapshotTable,
      events: DataFrame,
      queryId: String,
      epochId: Long,
      saltBuckets: Int = 64,
      saltedPreDedup: Boolean = false,
      sortDeltas: Boolean = false): StageOutcome =
    prepare(table, events, queryId, epochId, saltBuckets, saltedPreDedup) match {
      case None => FenceCovered
      case Some(p) if p.touched.isEmpty =>
        // Nothing fresh: metadata-only fence/watermark advance.
        StagedMor(Seq.empty, p.newSchema, p.wmAdvances,
          EpochMetrics(queryId, epochId, p.eventsIn, p.belowWm, 0, 0, 0, 0, 0), None)
      case Some(p) =>
        // ── MOR: append the batch as delta files — ZERO shuffle ─────────
        // Rows gain a `_bucket` column so each written file's footer
        // min/max bounds the bucket range it touches: a bucket-targeted
        // epoch yields narrow-range delta files and compaction/read-time
        // reconcile touch only those buckets (O(dirty buckets)); the
        // salted hash(doc_id) shuffle still happens exactly once per row,
        // at compaction/read-time reconcile. Ingest cost is a scan + a
        // write. `sortDeltas` adds a LOCAL (per-task, still shuffle-free)
        // sort on _bucket so maxRecordsPerFile splits of a broad batch also
        // get tight ranges — worth its CPU only when epochs are large AND
        // key-clustered; targeted batches are naturally narrow without it.
        val outDir = table.newDataDir(p.m.version + 1)
        val withBucket = p.staged
          .withColumn(Model.BucketCol, SnapshotTable.bucketOf(col("doc_id"), p.m.numBuckets))
          .select(
            p.newSchema.fieldNames.toSeq.map(col) ++
              Seq(col("lsn").as(Model.LsnCol), col("op").as(Model.OpCol),
                col(Model.BucketCol)): _*)
        val out = if (sortDeltas) withBucket.sortWithinPartitions(Model.BucketCol) else withBucket
        timed("write-delta")(out.write
          .option("maxRecordsPerFile", 4000000)
          .mode("overwrite")
          .parquet(outDir.toString))

        // bucket = -1 = "range file"; the real coverage is [bucketLo,
        // bucketHi] from the footer stats. MOR delta files depend only on
        // the batch (not on table contents), so a lost commit race rebases
        // by RE-POINTING these files at a higher version — no rewrite.
        val written = table.listDataFiles(outDir)
        val newEntries = timed("file-stats")(
          FileStats.entries(spark, written.map(path => (path, -1)), p.schemaId)
            .map(_.copy(kind = FileEntry.Delta)))
        StagedMor(newEntries, p.newSchema, p.wmAdvances,
          EpochMetrics(queryId, epochId, p.eventsIn, p.belowWm,
            collapsedInBatch = 0,
            upserts = p.freshCount - p.freshDeletes, deletes = p.freshDeletes,
            rowsWritten = newEntries.map(_.rows).sum, touchedBuckets = p.touched.size),
          Some(outDir))
    }

  private def mergeImpl(
      spark: SparkSession,
      table: SnapshotTable,
      events: DataFrame,
      queryId: String,
      epochId: Long,
      saltBuckets: Int,
      saltedPreDedup: Boolean,
      writeSplits: Int,
      mode: String,
      sortDeltas: Boolean,
      rebaseAttempt: Int): MergeResult = {

    if (mode == ModeMor) {
      return stageMor(spark, table, events, queryId, epochId, saltBuckets,
        saltedPreDedup, sortDeltas) match {
        case FenceCovered =>
          MergeResult(applied = false, None,
            table.manifest.map(_.version).getOrElse(-1L))
        case st: StagedMor =>
          commitRebasing(table, queryId, epochId,
            entries = st.entries, physicalSchema = Some(st.physicalSchema),
            wmAdvances = st.wmAdvances, metric = st.metric,
            cleanup = () => st.cleanup())
      }
    }

    val p = prepare(table, events, queryId, epochId, saltBuckets, saltedPreDedup) match {
      case None =>
        return MergeResult(applied = false, None,
          table.manifest.map(_.version).getOrElse(-1L))
      case Some(prep) => prep
    }
    if (p.touched.isEmpty) {
      // Nothing fresh: metadata-only fence/watermark advance.
      return commitRebasing(table, queryId, epochId,
        entries = Seq.empty, physicalSchema = Some(p.newSchema),
        wmAdvances = p.wmAdvances,
        metric = EpochMetrics(queryId, epochId, p.eventsIn, p.belowWm, 0, 0, 0, 0, 0),
        cleanup = () => ())
    }
    val Prep(m, mPrime, newSchema, schemaId, eventsIn, belowWm, freshCount,
      _, touched, _, newWatermarks, staged) = p

    val newVersion = m.version + 1
    val outDir = table.newDataDir(newVersion)

    {
      // ── COW: reconcile against live rows of touched buckets. Any MOR
      // delta files present (mode switch) are consumed whole — their
      // bucket ranges expand the rewrite set, and they are dropped from
      // the carried list once folded in, so a COW commit always leaves
      // the table base-only (no double-carried rows). ──────────────────
      val deltas = m.files.filter(_.isDelta)
      val touchedEff: Set[Int] =
        touched.toSet ++ deltas.flatMap(_.coveredBuckets(m.numBuckets))
      val liveEntries = m.files.filter(f =>
        f.isDelta || touchedEff.contains(f.bucket))
      val live = table.readEntries(spark, mPrime, liveEntries)
      val unioned = staged.unionByName(live)
      val counters = Reconcile.Counters(
        spark.sparkContext.longAccumulator(s"upserts-$epochId"),
        spark.sparkContext.longAccumulator(s"deletes-$epochId"),
        spark.sparkContext.longAccumulator(s"rows-$epochId"))
      val winners = Reconcile.winners(spark, unioned, m.numBuckets, writeSplits,
        Some(counters), rowsHint = table.rowsOf(liveEntries).map(_ + p.freshCount))
      val out = winners.select(
        newSchema.fieldNames.toSeq.map(col) ++
          Seq(col("lsn").as(Model.LsnCol), col("_bucket")): _*)
      timed("write-base")(clustered(out).write
        .option("maxRecordsPerFile", 4000000)
        .partitionBy("_bucket")
        .mode("overwrite")
        .parquet(outDir.toString))

      val nUpserts = counters.upserts.value.longValue
      val nDeletes = counters.deletes.value.longValue
      val written = timed("list-files")(table.listBucketFiles(outDir))
      val newEntries = FileStats.entries(spark, written, schemaId)
      val consumed = liveEntries.map(_.path).toSet
      val carried = m.files.filterNot(f => consumed.contains(f.path))
      val metric = EpochMetrics(queryId, epochId, eventsIn, belowWm,
        // staged events that did not become a final row. Accumulator-
        // backed: exact in normal runs; lineage never relies on them.
        collapsedInBatch = freshCount - nUpserts - nDeletes,
        upserts = nUpserts, deletes = nDeletes,
        rowsWritten = counters.rows.value.longValue, touchedBuckets = touched.size)
      val next = mPrime.copy(
        version = newVersion, parentVersion = m.version,
        files = carried ++ newEntries,
        fences = m.fences + (queryId -> epochId),
        watermarks = newWatermarks,
        metrics = (m.metrics :+ metric).takeRight(MetricsRetained))
      try {
        table.commit(next)
        MergeResult(applied = true, Some(metric), next.version)
      } catch {
        case e: SnapshotTable.ConcurrentCommitException =>
          // COW reconciled against a manifest that just changed under us:
          // unlike MOR deltas, the rewritten buckets are stale (the racer
          // may have merged into the very rows we read), so rebase =
          // discard our output and REDO the whole merge on the fresh
          // table.
          scala.util.Try(graft.util.Tables.deleteRecursively(outDir.toString))
          if (rebaseAttempt >= MaxRebases) throw e
          Thread.sleep(math.min(1000L, 100L * (rebaseAttempt + 1)))
          mergeImpl(spark, table, events, queryId, epochId, saltBuckets,
            saltedPreDedup, writeSplits, mode, sortDeltas, rebaseAttempt + 1)
      }
    }
  }

  /** Commit with automatic REBASE (multi-writer: two live writers on
    * distinct fence lanes both succeed; the loser re-reads and re-points).
    * On an optimistic-concurrency loss the commit metadata — schema list,
    * file list, fences, watermarks, metrics window — is recomputed on top
    * of the freshly published manifest and retried. The already-written
    * MOR delta files need no rewrite: their content depends only on the
    * batch, rows that a racer's commit made stale are dropped by the
    * last-LSN-wins reconcile, and watermark merges take per-partition
    * max so nothing regresses. If the fresh manifest's fence already
    * covers this epoch (a racer on the SAME lane applied it), the written
    * files are orphans: `cleanup` removes them and the merge reports
    * not-applied — exactly-once holds across writers, not just restarts.
    */
  private[cdc] def commitRebasing(
      table: SnapshotTable,
      queryId: String,
      epochId: Long,
      entries: Seq[FileEntry],
      physicalSchema: Option[StructType],
      wmAdvances: Map[String, Long],
      metric: EpochMetrics,
      cleanup: () => Unit): MergeResult = {
    var attempts = 0
    while (true) {
      val fresh = table.manifest.getOrElse(sys.error(s"table vanished: ${table.root}"))
      if (fresh.fences.get(queryId).exists(_ >= epochId)) {
        cleanup()
        return MergeResult(applied = false, None, fresh.version)
      }
      val (schemas2, sid) = schemasWith(fresh.schemas, physicalSchema)
      val mergedWm = fresh.watermarks ++ wmAdvances.map { case (k, v) =>
        k -> math.max(v, fresh.watermarks.getOrElse(k, Long.MinValue))
      }
      val next = fresh.copy(
        version = fresh.version + 1, parentVersion = fresh.version,
        schemas = schemas2,
        files = fresh.files ++ entries.map(_.copy(schemaId = sid)),
        fences = fresh.fences + (queryId -> epochId),
        watermarks = mergedWm,
        metrics = (fresh.metrics :+ metric).takeRight(MetricsRetained))
      try {
        table.commit(next)
        return MergeResult(applied = true, Some(metric), next.version)
      } catch {
        case e: SnapshotTable.ConcurrentCommitException =>
          attempts += 1
          if (attempts > MaxRebases) throw e
          // brief backoff: the racer is at most a manifest-write away
          // from publishing (or its claim expires via the lease TTL)
          Thread.sleep(math.min(1000L, 100L * attempts))
      }
    }
    sys.error("unreachable")
  }

  /** Insert the written files' physical schema (and the possibly wider
    * merged current schema) into a manifest's append-only schema list.
    * Returns the new list and the schemaId the written files carry.
    * Rebase-safe: computed against whatever manifest the commit attempt
    * lands on, so a racer's own schema evolution composes additively.
    */
  private def schemasWith(
      base: Seq[String], physicalSchema: Option[StructType]): (Seq[String], Int) =
    physicalSchema match {
      case None => (base, base.size - 1)
      case Some(p) =>
        val current = DataType.fromJson(base.last).asInstanceOf[StructType]
        val merged = SnapshotTable.mergeSchemas(current, p)
        val (withPhys, sid) = base.indexOf(p.json) match {
          case -1 => (base :+ p.json, base.size)
          case i => (base, i)
        }
        val full = if (withPhys.last == merged.json) withPhys else withPhys :+ merged.json
        (full, sid)
    }

  /** Reconcile the merge-on-read deltas of every bucket that has any into
    * fresh base files (tombstones drop out). Amortized maintenance —
    * lineage (fences/watermarks) is untouched, so it can run any time
    * between epochs. O(buckets-with-deltas), not O(table).
    */
  def compact(
      spark: SparkSession,
      table: SnapshotTable,
      writeSplits: Int = 4,
      targetFileBytes: Long = 128L << 20): Option[Long] = {
    val m = table.manifest.getOrElse(sys.error(s"table not initialized: ${table.root}"))
    val deltas = m.files.filter(_.isDelta)
    if (deltas.isEmpty) return None

    // Dirty = union of the delta files' bucket ranges (footer-derived).
    // Only dirty buckets' base files are read and rewritten; clean
    // buckets carry their files forward untouched — O(dirty buckets).
    val dirty: Set[Int] = deltas.flatMap(_.coveredBuckets(m.numBuckets)).toSet
    val affected = m.files.filter(f => f.isDelta || dirty.contains(f.bucket))
    val rows = table.readEntries(spark, m, affected)
    val winners = Reconcile.winners(spark, rows, m.numBuckets, writeSplits,
      rowsHint = table.rowsOf(affected))
    val payload = DataType.fromJson(m.currentSchemaJson).asInstanceOf[StructType]
    val out = winners.select(
      payload.fieldNames.toSeq.map(col) ++
        Seq(col("lsn").as(Model.LsnCol), col("_bucket")): _*)

    val newVersion = m.version + 1
    val outDir = table.newDataDir(newVersion)
    // Target-size splitting: estimate rows-per-file from the affected
    // entries' observed bytes/row (footer metadata recorded at commit), so
    // rewritten files land near `targetFileBytes` — a hardcoded row cap
    // over- or under-shoots by the payload width (a tokens array varies
    // 100× across sources). Entries with unknown bytes (pre-round-4
    // manifests) are excluded from the estimate; with no estimate at all,
    // fall back to the historical 4M-row cap.
    val known = affected.filter(f => f.bytes > 0 && f.rows > 0)
    val maxRecords: Long =
      if (known.isEmpty) 4000000L
      else {
        val bytesPerRow = known.map(_.bytes).sum.toDouble / known.map(_.rows).sum
        math.max(1L, (targetFileBytes / bytesPerRow).toLong)
      }
    timed("compact-write")(clustered(out).write
      .option("maxRecordsPerFile", maxRecords)
      .partitionBy("_bucket")
      .mode("overwrite")
      .parquet(outDir.toString))

    val written = table.listBucketFiles(outDir)
    val newEntries = FileStats.entries(spark, written, m.schemas.size - 1)
    val affectedSet = affected.map(_.path).toSet
    val carried = m.files.filterNot(f => affectedSet.contains(f.path))
    val next = m.copy(
      version = newVersion, parentVersion = m.version,
      files = carried ++ newEntries)
    try {
      table.commit(next)
      Some(newVersion)
    } catch {
      case _: SnapshotTable.ConcurrentCommitException =>
        // Compaction is pure maintenance: losing a race costs nothing but
        // the wasted rewrite — discard it and let the next size-policy
        // trigger retry against the new manifest.
        scala.util.Try(graft.util.Tables.deleteRecursively(outDir.toString))
        None
    }
  }

  /** Right-to-be-forgotten erasure (the GDPR path a training-data lake
    * must have): physically rewrite ONLY the buckets the purged keys hash
    * to, dropping every row of those keys; every other file is carried
    * forward BY IDENTITY into the new snapshot. O(touched buckets), never
    * O(table) — at thousands of buckets a bounded erasure request
    * rewrites a sliver. Merge-on-read deltas covering a touched bucket
    * are folded in (their whole covered range joins the rewrite, exactly
    * like [[compact]], so no delta row is orphaned). The purge commits a
    * NEW version: older snapshots still reference the pre-purge files, so
    * a complete erasure follows with `expireSnapshots(keepLast = 1)` once
    * the retention window allows — returned paths say which files held
    * purged rows. `keys` is a one-column DataFrame of key values, bounded
    * (an erasure request, not a corpus): it is collected once for bucket
    * targeting and broadcast for the anti-join.
    */
  def purgeKeys(
      spark: SparkSession,
      table: SnapshotTable,
      keys: DataFrame,
      keyCol: String = "doc_id",
      writeSplits: Int = 4): Option[PurgeResult] = {
    val m = table.manifest.getOrElse(sys.error(s"table not initialized: ${table.root}"))
    val targets: Set[Int] = keys
      .select(SnapshotTable.bucketOf(col(keyCol), m.numBuckets).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    // fixpoint expansion: a delta file covering a target bucket brings its
    // WHOLE bucket range into the rewrite (its other buckets' rows live in
    // the same file and must be rewritten, not lost)
    var dirty = targets
    var affected = m.files.filter(f => dirty.exists(f.covers))
    var grown = true
    while (grown) {
      val expanded = dirty ++ affected.filter(_.isDelta)
        .flatMap(_.coveredBuckets(m.numBuckets))
      grown = expanded.size > dirty.size
      dirty = expanded
      affected = m.files.filter(f => dirty.exists(f.covers))
    }
    if (affected.isEmpty) return None

    val winners = Reconcile.winners(
      spark, table.readEntries(spark, m, affected), m.numBuckets, writeSplits,
      rowsHint = table.rowsOf(affected))
    val kept = winners.join(broadcast(keys.select(col(keyCol)).distinct()),
      Seq(keyCol), "left_anti")
    val payload = DataType.fromJson(m.currentSchemaJson).asInstanceOf[StructType]
    val out = kept.select(
      payload.fieldNames.toSeq.map(col) ++
        Seq(col("lsn").as(Model.LsnCol), col("_bucket")): _*)

    val newVersion = m.version + 1
    val outDir = table.newDataDir(newVersion)
    timed("purge-write")(clustered(out).write
      .partitionBy("_bucket")
      .mode("overwrite")
      .parquet(outDir.toString))
    val newEntries = FileStats.entries(
      spark, table.listBucketFiles(outDir), m.schemas.size - 1)
    val affectedSet = affected.map(_.path).toSet
    val carried = m.files.filterNot(f => affectedSet.contains(f.path))
    val purgedRows = affected.map(_.rows).sum - newEntries.map(_.rows).sum
    val next = m.copy(
      version = newVersion, parentVersion = m.version,
      files = carried ++ newEntries)
    try {
      table.commit(next)
      Some(PurgeResult(newVersion, dirty, purgedRows, affected.map(_.path)))
    } catch {
      case _: SnapshotTable.ConcurrentCommitException =>
        scala.util.Try(graft.util.Tables.deleteRecursively(outDir.toString))
        None
    }
  }

  /** Outcome of [[purgeKeys]]: the committed version, the buckets
    * rewritten, the net row delta (for MOR inputs this includes delta
    * rows and tombstones folded away, not just purged keys), and the
    * superseded files that may still hold purged rows in OLDER snapshots
    * (physically reclaimed by `expireSnapshots` after retention).
    */
  final case class PurgeResult(version: Long, buckets: Set[Int],
      rowDelta: Long, supersededFiles: Seq[String])
}
