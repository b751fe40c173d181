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

  test("bucketed open set: untouched buckets carry forward by file identity; emptied buckets drop") {
    import java.nio.file.{Files => JFiles}
    val work = tmpDir("scd2buckets").toString
    writeLog(s"$work/log")
    val nb = 8
    val cfg = Scd2Stream.Config(
      logDir = s"$work/log", tableDir = s"$work/table",
      checkpointDir = s"$work/ckpt", schema = schema,
      maxFilesPerTrigger = Some(1), numBuckets = nb)
    Scd2Stream.start(spark, cfg).awaitTermination()

    def bucketOf(key: String): Int = spark.range(1)
      .select(pmod(xxhash64(lit(key)), lit(nb.toLong)).cast("int")).head.getInt(0)
    // fresh (watermark-surviving) keys per epoch — the epoch-2
    // re-deliveries of a and b are refused, so they touch nothing
    val freshKeys = Seq(0 -> Seq("a", "b", "c"), 1 -> Seq("a", "b", "d"), 2 -> Seq("c", "e"))
    val lastTouched: Map[Int, Long] = freshKeys
      .flatMap { case (e, ks) => ks.map(k => bucketOf(k) -> e.toLong) }
      .groupMapReduce(_._1)(_._2)(math.max)
    // final open keys: a (a4), c (c7), d (d6), e (e8); b closed by delete
    val openBuckets = Seq("a", "c", "d", "e").map(bucketOf).toSet
    val expected = lastTouched.filter { case (b, _) => openBuckets.contains(b) }

    val meta = Scd2Stream.readMeta(s"$work/table").get
    assert(meta.buckets === expected,
      s"bucket map law violated: got ${meta.buckets}, want $expected")
    // carry-forward is by FILE IDENTITY: a bucket last touched before the
    // fence is served from the epoch dir that wrote it — no rewrite
    val carried = meta.buckets.filter(_._2 < meta.lastEpoch)
    assert(carried.nonEmpty, "fixture should leave at least one carried-forward bucket")
    carried.foreach { case (b, e) =>
      val d = java.nio.file.Paths.get(s"$work/table/open/epoch=$e/_b=$b")
      assert(JFiles.isDirectory(d), s"carried bucket dir missing: $d")
      assert(graft.util.Tables.listClosed(d)(
        _.exists(_.getFileName.toString.startsWith("part-"))), s"no data files at $d")
    }
    // and the bucketed layout still reproduces the one-shot rebuild
    val fresh = epochs.head.unionByName(epochs(1))
      .unionByName(epochs(2).filter($"lsn" > 6))
    assert(canon(Scd2Stream.read(spark, s"$work/table")) ===
      canon(Scd2.fromChangelog(fresh, Seq("doc_id"), "lsn")))

    // vacuum: superseded bucket dirs go, the referenced set stays, reads unchanged
    val before = canon(Scd2Stream.read(spark, s"$work/table"))
    Scd2Stream.vacuumOpen(s"$work/table")
    meta.buckets.foreach { case (b, e) =>
      assert(JFiles.isDirectory(java.nio.file.Paths.get(s"$work/table/open/epoch=$e/_b=$b")),
        s"vacuum deleted a live bucket dir (epoch=$e b=$b)")
    }
    assert(canon(Scd2Stream.read(spark, s"$work/table")) === before)
  }

  test("a bucket emptied by deletes leaves the map; part-less dirs never poison reads") {
    val work = tmpDir("scd2empty").toString
    val dir = s"$work/log"
    Files.createDirectories(Paths.get(dir))
    val t0 = System.currentTimeMillis()
    def df(rows: (String, Long, Int, String, String)*) =
      rows.toDF("doc_id", "lsn", "partition", "op", "payload")
    ChangelogGen.writeSingleFile(df(("x", 1L, 0, "I", "x1")).orderBy("lsn"),
      Paths.get(dir), "chunk-00000.parquet", Some(t0))
    ChangelogGen.writeSingleFile(df(("x", 2L, 0, "D", null)).orderBy("lsn"),
      Paths.get(dir), "chunk-00001.parquet", Some(t0 + 1000L))
    val cfg = Scd2Stream.Config(
      logDir = dir, tableDir = s"$work/table", checkpointDir = s"$work/ckpt",
      schema = schema, maxFilesPerTrigger = Some(1), numBuckets = 4)
    Scd2Stream.start(spark, cfg).awaitTermination()
    val meta = Scd2Stream.readMeta(s"$work/table").get
    assert(meta.lastEpoch === 1L)
    assert(meta.buckets.isEmpty, s"deleted-out bucket still mapped: ${meta.buckets}")
    val t = Scd2Stream.read(spark, s"$work/table")
    assert(t.count() === 1L && t.filter($"is_current").count() === 0L)
  }

  test("uncommitted closed dir (crash between data write and meta move) is invisible") {
    val work = tmpDir("scd2crash").toString
    writeLog(s"$work/log")
    val cfg = Scd2Stream.Config(
      logDir = s"$work/log", tableDir = s"$work/table",
      checkpointDir = s"$work/ckpt", schema = schema,
      maxFilesPerTrigger = Some(1))
    Scd2Stream.start(spark, cfg).awaitTermination()
    val before = canon(Scd2Stream.read(spark, s"$work/table"))
    // simulate the crash window: closed/epoch=99 written, meta never moved
    Scd2Stream.read(spark, s"$work/table").filter(!$"is_current").limit(1)
      .write.parquet(s"$work/table/closed/epoch=99")
    assert(canon(Scd2Stream.read(spark, s"$work/table")) === before,
      "phantom rows from an uncommitted closed epoch leaked into the read")
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
