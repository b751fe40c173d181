package graft.cdc

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming maintenance of a type-2 temporal table: tail the ordered
  * changelog and fold each micro-batch through [[Scd2.merge]] — the
  * streaming complement of the MERGE snapshot ingest (IngestJob keeps
  * survivors; this keeps every version's validity interval). The dbt
  * analog is a `snapshots/` model re-run per sync (the reference runs its
  * loop monthly, dags/nyc_taxi_sync_dag.py:40-55); here it is continuous.
  *
  * Storage layout is what makes the fold O(batch + open rows) per epoch
  * instead of O(history):
  *   - `closed/epoch=N/` — versions closed during epoch N. Append-only:
  *     closed intervals are immutable facts, never rewritten. A replayed
  *     epoch OVERWRITES its own dir (idempotent side channel).
  *   - `open/epoch=N/`  — the full open set as of epoch N (one row per
  *     live key; bounded by key count, not history).
  *   - `_scd2_meta.json` — fence (last applied epoch) + per-partition
  *     applied-LSN watermarks, moved into place atomically LAST, so a
  *     crash between data and meta replays the epoch onto the previous
  *     pointer (the overwrite-by-epoch layout absorbs it).
  *
  * Dedup contract (same as the ingest's): events of one source partition
  * arrive in non-decreasing LSN order across batches, and a key is sticky
  * to its partition — so a per-PARTITION watermark (4 longs, not a keyed
  * index) suffices to drop re-deliveries, INCLUDING the resurrection
  * case: a re-delivered insert of an already-deleted key has no open row
  * to collide with, so only the watermark can refuse it (law-tested in
  * Scd2StreamSpec).
  */
object Scd2Stream {

  case class Config(
      logDir: String,
      tableDir: String,
      checkpointDir: String,
      keyCols: Seq[String] = Seq("doc_id"),
      ordCol: String = "lsn",
      partitionCol: String = "partition",
      queryId: String = "scd2-stream",
      schema: StructType = Model.changeEventSchema,
      maxFilesPerTrigger: Option[Int] = None,
      availableNow: Boolean = true,
      processingTime: String = "5 seconds")

  private case class Meta(lastEpoch: Long, watermarks: Map[Int, Long])

  private def metaPath(tableDir: String): Path = Paths.get(tableDir, "_scd2_meta.json")

  private def readMeta(tableDir: String): Option[Meta] = {
    val p = metaPath(tableDir)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      val epoch = """"lastEpoch":(-?\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
      val wms = """"(\d+)":(-?\d+)""".r.findAllMatchIn(s)
        .map(m => m.group(1).toInt -> m.group(2).toLong).toMap
      Some(Meta(epoch, wms))
    }
  }

  private def writeMeta(tableDir: String, m: Meta): Unit = {
    val wmJson = m.watermarks.toSeq.sortBy(_._1)
      .map { case (p, w) => s""""$p":$w""" }.mkString("{", ",", "}")
    val json = s"""{"lastEpoch":${m.lastEpoch},"watermarks":$wmJson}"""
    val tmp = Files.createTempFile(Paths.get(tableDir), ".meta", ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metaPath(tableDir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The current temporal table: all immutable closed versions plus the
    * latest open set. Old `open/epoch=K` dirs are retained snapshots of
    * the open frontier (cheap time travel over the live edge); only the
    * fenced latest participates in the current read.
    */
  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val meta = readMeta(tableDir).getOrElse(
      throw new IllegalStateException(s"no scd2 table at $tableDir"))
    val open = spark.read.parquet(s"$tableDir/open/epoch=${meta.lastEpoch}")
    val closedRoot = Paths.get(tableDir, "closed")
    val closedDirs =
      if (!Files.exists(closedRoot)) Seq.empty
      else {
        val s = Files.list(closedRoot)
        try s.iterator().asScala.map(_.toString).filter(_.contains("epoch=")).toList
        finally s.close()
      }
    // explicit schema: an epoch that closed nothing leaves a part-less
    // dir, which schema INFERENCE rejects but a schema-given read returns
    // as empty — and the open/closed schemas are identical by construction
    closedDirs.foldLeft(open)((acc, d) =>
      acc.unionByName(spark.read.schema(open.schema).parquet(d)))
  }

  def start(spark: SparkSession, cfg: Config): StreamingQuery = {
    Files.createDirectories(Paths.get(cfg.tableDir))
    var reader = spark.readStream.schema(cfg.schema)
    cfg.maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(cfg.logDir)

    val applyBatch: (Dataset[Row], Long) => Unit = { (batch, epochId) =>
      val meta = readMeta(cfg.tableDir)
      // epochId == lastEpoch is the legitimate checkpoint-recovery
      // re-delivery (no-op); BELOW it means a fresh checkpoint was pointed
      // at an existing table — every batch would silently no-op on the
      // fence, so fail loudly instead (same contract as the graft sink)
      meta.filter(_.lastEpoch > epochId).foreach { m =>
        throw new IllegalStateException(
          s"scd2 stream: batchId $epochId is below the committed fence " +
            s"${m.lastEpoch} at ${cfg.tableDir} — restarting with a fresh " +
            "checkpoint against an existing table drops data; retire the " +
            "table together with its checkpoint")
      }
      if (meta.exists(_.lastEpoch == epochId)) () // fenced replay: no-op
      else {
        val src = batch.persist() // same rationale as IngestJob: the
        // foreachBatch frame is RDD-backed; every action re-reads the
        // source files, and the fold below runs several
        try {
          val valid = src.filter(IngestJob.validExpr(src))
          val wms = meta.map(_.watermarks).getOrElse(Map.empty)
          // per-partition watermark filter: strictly-above keeps fresh
          // events, drops every re-delivery (incl. deleted-key inserts)
          val wmExpr = wms.foldLeft(lit(true)) { case (acc, (p, w)) =>
            acc && (col(cfg.partitionCol) =!= p || col(cfg.ordCol) > w)
          }
          val fresh = valid.filter(wmExpr)
          val priorOpen = meta.map(m =>
            spark.read.parquet(s"${cfg.tableDir}/open/epoch=${m.lastEpoch}"))
          val merged = (priorOpen match {
            case None => Scd2.fromChangelog(fresh, cfg.keyCols, cfg.ordCol)
            case Some(open) => Scd2.merge(open, fresh, cfg.keyCols, cfg.ordCol)
          }).persist()
          try {
            merged.filter(!col("is_current"))
              .write.mode("overwrite").parquet(s"${cfg.tableDir}/closed/epoch=$epochId")
            merged.filter(col("is_current"))
              .write.mode("overwrite").parquet(s"${cfg.tableDir}/open/epoch=$epochId")
            // advance watermarks from the APPLIED events, then fence —
            // meta moves last so a crash replays onto the old pointer
            val applied = fresh.groupBy(col(cfg.partitionCol))
              .agg(max(col(cfg.ordCol)).as("w"))
              .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
            val newWms = (wms.keySet ++ applied.keySet).map(p =>
              p -> math.max(wms.getOrElse(p, Long.MinValue),
                applied.getOrElse(p, Long.MinValue))).toMap
            writeMeta(cfg.tableDir, Meta(epochId, newWms))
          } finally merged.unpersist()
        } finally src.unpersist()
      }
      ()
    }

    stream.writeStream
      .queryName(cfg.queryId)
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(
        if (cfg.availableNow) Trigger.AvailableNow()
        else Trigger.ProcessingTime(cfg.processingTime))
      .foreachBatch(applyBatch)
      .start()
  }
}
