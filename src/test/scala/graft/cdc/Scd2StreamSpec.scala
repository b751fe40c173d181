package graft.cdc

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming SCD2 maintenance: the foreachBatch fold must reproduce the
  * one-shot rebuild over the deduped log, refuse re-deliveries by
  * per-partition watermark (including the deleted-key resurrection), and
  * fence fresh-checkpoint restarts loudly.
  */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  // three epochs over two source partitions; epoch 2 re-delivers two
  // epoch-1 events (one of them an insert of a key DELETED in epoch 1 —
  // the resurrection case a key-level watermark cannot catch)
  private def epochs: Seq[DataFrame] = {
    def df(rows: (String, Long, Int, String, String)*) =
      rows.toDF("doc_id", "lsn", "partition", "op", "payload")
    Seq(
      df(("a", 1L, 0, "I", "a1"), ("b", 2L, 1, "I", "b2"), ("c", 3L, 0, "I", "c3")),
      df(("a", 4L, 0, "U", "a4"), ("b", 5L, 1, "D", null), ("d", 6L, 1, "I", "d6")),
      df(("b", 2L, 1, "I", "b2"), // resurrection attempt: b was deleted
        ("a", 4L, 0, "U", "a4"),  // plain re-delivery
        ("c", 7L, 0, "U", "c7"), ("e", 8L, 1, "I", "e8")))
  }

  private def schema = epochs.head.schema

  private def writeLog(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    val t0 = System.currentTimeMillis()
    epochs.zipWithIndex.foreach { case (e, k) =>
      ChangelogGen.writeSingleFile(
        e.orderBy("lsn"), Paths.get(dir), f"chunk-$k%05d.parquet", Some(t0 + k * 1000L))
    }
  }

  private def canon(d: DataFrame): Seq[String] =
    d.select("doc_id", "valid_from_lsn", "valid_to_lsn", "is_current", "payload")
      .collect().map(_.toString).sorted.toSeq

  test("streamed fold equals the one-shot rebuild; resurrection refused") {
    val work = tmpDir("scd2stream").toString
    writeLog(s"$work/log")
    val cfg = Scd2Stream.Config(
      logDir = s"$work/log", tableDir = s"$work/table",
      checkpointDir = s"$work/ckpt", schema = schema,
      maxFilesPerTrigger = Some(1))
    Scd2Stream.start(spark, cfg).awaitTermination()

    // oracle: the rebuild over the unique fresh events (re-deliveries out)
    val fresh = epochs.head.unionByName(epochs(1))
      .unionByName(epochs(2).filter($"lsn" > 6))
    val expect = canon(Scd2.fromChangelog(fresh, Seq("doc_id"), "lsn"))
    val got = canon(Scd2Stream.read(spark, s"$work/table"))
    assert(got === expect)
    // b stayed dead: one closed version, nothing current
    val b = Scd2Stream.read(spark, s"$work/table").filter($"doc_id" === "b")
    assert(b.count() === 1L && b.filter($"is_current").count() === 0L)
  }

  test("fresh checkpoint against an existing table fails loudly, not silently") {
    val work = tmpDir("scd2fence").toString
    writeLog(s"$work/log")
    val cfg = Scd2Stream.Config(
      logDir = s"$work/log", tableDir = s"$work/table",
      checkpointDir = s"$work/ckpt", schema = schema,
      maxFilesPerTrigger = Some(1))
    Scd2Stream.start(spark, cfg).awaitTermination()
    val before = canon(Scd2Stream.read(spark, s"$work/table"))
    val restarted = Scd2Stream.start(spark, cfg.copy(checkpointDir = s"$work/ckpt2"))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      restarted.awaitTermination()
    }
    assert(ex.getMessage.contains("below the committed fence") ||
      Option(ex.getCause).exists(_.getMessage.contains("below the committed fence")))
    // and the table is untouched
    assert(canon(Scd2Stream.read(spark, s"$work/table")) === before)
  }
}
