package graft.cdc

import org.apache.hadoop.fs.FileSystem
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The ingest loop must not multiply source I/O. foreachBatch hands the
  * sink an RDD-backed frame, so every action on it re-runs the full file
  * read — and one epoch takes 2 actions (stats job + write), 3 with the
  * quarantine split. [[IngestJob.Config.persistBatches]] caches the batch
  * so the epoch's log files are read from disk ONCE.
  *
  * Plan inspection cannot see this (the read hides inside LogicalRDD
  * recomputation), so the spec measures what actually matters: bytes read
  * through the local filesystem, via Hadoop's global per-scheme storage
  * statistics — local[n] runs every task in this JVM, so the counter
  * captures executor-side reads too.
  */
class QuarantineScanSpec extends SparkSpec {

  private def fileBytesRead(): Long =
    FileSystem.getGlobalStorageStatistics.get("file") match {
      case null => 0L
      case s => Option(s.getLong("bytesRead")).map(_.longValue).getOrElse(0L)
    }

  /** A changelog where ~1/7 of events violate the n_tok == size(tokens)
    * invariant (quarantined by the ingest validity predicate).
    */
  private def makeLog(marker: String): String = {
    val staging = tmpDir(s"$marker-staging")
    ChangelogGen.writeLog(spark,
      ChangelogGen.Config(numEvents = 6000, numDocs = 1200, numFiles = 3), staging.toString)
    val out = tmpDir(marker).resolve("log").toString
    spark.read.parquet(staging.toString)
      .withColumn("n_tok",
        when(pmod(col("lsn"), lit(7L)) === 0, col("n_tok") + 1).otherwise(col("n_tok")))
      .repartition(3)
      .write.parquet(out)
    out
  }

  /** Bytes read from disk during a quarantine-enabled replay. */
  private def measuredReplay(logDir: String, marker: String, persist: Boolean): (Long, String, String) = {
    val tableDir = tmpDir(s"$marker-table").toString
    val quarDir = tmpDir(s"$marker-quar").toString
    val before = fileBytesRead()
    IngestJob.replay(spark, IngestJob.Config(
      logDir = logDir, tableDir = tableDir,
      checkpointDir = tmpDir(s"$marker-ckpt").toString,
      maxFilesPerTrigger = Some(1),
      numBuckets = 4,
      quarantineDir = Some(quarDir),
      compaction = CompactionPolicy.Never,
      persistBatches = persist))
    (fileBytesRead() - before, tableDir, quarDir)
  }

  test("persistBatches reads each epoch's log once; without it the split multiplies source I/O") {
    val logDir = makeLog("qscan")
    // warm the path once so JIT/footer-cache effects don't skew the pair
    measuredReplay(logDir, "qscan-warm", persist = true)

    val (bytesCached, tableDir, quarDir) = measuredReplay(logDir, "qscan-on", persist = true)
    val (bytesUncached, _, _) = measuredReplay(logDir, "qscan-off", persist = false)

    // Identical work, identical log: the unpersisted loop's 3 actions per
    // epoch must show up as materially more disk reading than the cached
    // loop's single materialization (expected ~3x; require >= 1.6x to
    // stay robust to fixed overheads like checkpoint and footer reads).
    assert(bytesCached > 0 && bytesUncached > 0, s"counter dead: $bytesCached / $bytesUncached")
    val ratio = bytesUncached.toDouble / bytesCached
    assert(ratio >= 1.6,
      f"persistBatches saved too little: uncached $bytesUncached%d vs cached $bytesCached%d (ratio $ratio%.2f)")

    // the split is semantically intact: invalid rows landed in quarantine
    // only, valid rows in the table only
    val quarantined = spark.read.parquet(quarDir)
    assert(quarantined.count() > 0)
    assert(quarantined.filter(col("n_tok") === size(col("tokens"))).count() == 0)
    val table = new SnapshotTable(tableDir, 4).read(spark)
    assert(table.count() > 0)
    assert(table.filter(col("n_tok") =!= size(col("tokens"))).count() == 0)
  }
}
