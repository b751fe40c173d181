package graft.cdc

/** When to fold merge-on-read deltas back into base files — SIZE-based,
  * not a fixed epoch counter. The reference delegates the equivalent
  * maintenance to Snowflake's automatic clustering
  * (nyc_taxi_dbt/models/marts/core/fct_trips.sql:6 `cluster_by`); with a
  * self-managed lake table the trigger must be explicit, and an epoch
  * counter is wrong at a sustained 10^10-event log with uneven epochs: it
  * either compacts too often (rewrite churn on a trickle) or lets delta
  * files pile up (read amplification on a burst). Instead compaction
  * fires on what actually hurts:
  *
  *  - `maxDeltaBytes` — total uncompacted delta volume: bounds the worst
  *    case read-side reconcile input regardless of epoch cadence;
  *  - `maxDeltaFilesPerBucket` — the per-bucket READ AMPLIFICATION bound:
  *    a reader of one bucket opens its base files plus every delta file
  *    whose [bucketLo, bucketHi] range covers the bucket, so this is the
  *    max extra files any point read pays;
  *  - `everyEpochs` — the legacy counter, kept as an optional floor for
  *    tests/benchmarks that need a deterministic cadence (0 = off).
  *
  * Both size triggers are computed from manifest metadata only (the
  * footer-derived `bytes`/range fields each commit already records) —
  * O(files) driver arithmetic, no filesystem or Spark job.
  *
  * `targetFileBytes` sizes the REWRITE: compact estimates rows-per-file
  * from the affected entries' observed bytes/row so output files land
  * near the target instead of a hardcoded row cap — small buckets stop
  * fragmenting and huge buckets stop producing multi-GB files.
  */
case class CompactionPolicy(
    maxDeltaBytes: Long = 512L << 20,
    maxDeltaFilesPerBucket: Int = 8,
    targetFileBytes: Long = 128L << 20,
    everyEpochs: Int = 0) {

  def shouldCompact(table: SnapshotTable, epochId: Long): Boolean =
    table.manifest.exists(shouldCompact(_, epochId))

  def shouldCompact(m: Manifest, epochId: Long): Boolean = {
    val deltas = m.files.filter(_.isDelta)
    if (deltas.isEmpty) return false
    if (everyEpochs > 0 && (epochId + 1) % everyEpochs == 0) return true
    if (deltas.map(_.bytes).sum >= maxDeltaBytes) return true
    maxCoverage(deltas, m.numBuckets) >= maxDeltaFilesPerBucket
  }

  /** Highest number of delta files covering any single bucket, via a
    * difference array over the bucket ranges — O(files + buckets).
    */
  private[cdc] def maxCoverage(deltas: Seq[FileEntry], numBuckets: Int): Int = {
    val diff = new Array[Int](numBuckets + 1)
    deltas.foreach { f =>
      val r = f.coveredBuckets(numBuckets)
      if (r.nonEmpty) { diff(r.head) += 1; diff(r.last + 1) -= 1 }
    }
    var best = 0; var cur = 0; var b = 0
    while (b < numBuckets) { cur += diff(b); if (cur > best) best = cur; b += 1 }
    best
  }
}

object CompactionPolicy {
  /** The pre-round-4 behavior, for specs that exercise a fixed cadence. */
  def counter(everyEpochs: Int): CompactionPolicy =
    CompactionPolicy(maxDeltaBytes = Long.MaxValue,
      maxDeltaFilesPerBucket = Int.MaxValue, everyEpochs = everyEpochs)

  /** Never compact mid-stream (caller manages maintenance). */
  val Never: CompactionPolicy = CompactionPolicy(
    maxDeltaBytes = Long.MaxValue, maxDeltaFilesPerBucket = Int.MaxValue)
}
