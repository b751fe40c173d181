package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import graft.SparkSpec

/** Structured-Streaming semantics beyond the ingest engine (SURVEY.md
  * §2.9): event-time windowed aggregation with a watermark, and custom
  * sessionization state via mapGroupsWithState — the Spark-native
  * replacements for the reference's processing-time Redis counters
  * (fraud_detector.py:54-118, which have no watermark and double-count on
  * replay).
  */
case class Ev(user_id: Long, ts: Timestamp, value: Double)
case class SessionAgg(user_id: Long, n_sessions: Int, n_events: Long)

class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def mkEvents(n: Int): Seq[Ev] = {
    val rnd = new scala.util.Random(7L)
    (0 until n).map { i =>
      // 20 users, bursts with occasional >30min gaps
      val user = rnd.nextInt(20).toLong
      val t = 1700000000000L + i.toLong * 60000L + rnd.nextInt(50000)
      Ev(user, new Timestamp(t), rnd.nextDouble() * 100)
    }
  }

  /** Write events as k chronologically-ordered log files (ascending
    * mtimes) so the watermark advances across micro-batches.
    */
  private def writeOrdered(events: Seq[Ev], dir: java.nio.file.Path, k: Int): Unit = {
    val sorted = events.sortBy(_.ts.getTime)
    val per = math.max(1, sorted.size / k)
    val t0 = System.currentTimeMillis()
    sorted.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      graft.cdc.ChangelogGen.writeSingleFile(
        chunk.toDF(), dir, f"ev-$i%05d.parquet", Some(t0 + i * 1000L))
    }
  }

  test("watermarked event-time windowed aggregation (file-stream replay)") {
    val events = mkEvents(2000)
    val inDir = tmpDir("stream-in")
    writeOrdered(events, inDir, 4)

    val outDir = tmpDir("stream-out"); val ckpt = tmpDir("stream-ckpt")
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir.toString)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"user_id")
      .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(18,6)")).cast("double").as("v"))

    val q = stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir.toString)
      .start()
    q.awaitTermination()

    // Append mode emits only windows closed by the watermark; verify those
    // against the batch equivalent.
    val got = spark.read.parquet(outDir.toString)
      .select($"window.start".as("ws"), $"user_id", $"n", $"v")
    val batch = events.toDF()
      .groupBy(window($"ts", "1 hour"), $"user_id")
      .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(18,6)")).cast("double").as("v"))
      .select($"window.start".as("ws"), $"user_id", $"n", $"v")
    val joined = got.join(batch, Seq("ws", "user_id"), "inner")
      .filter(got("n") =!= batch("n") || got("v") =!= batch("v"))
    assert(got.count() > 0, "no windows emitted")
    assert(joined.isEmpty, "streamed windows disagree with batch aggregation")
  }

  test("mapGroupsWithState sessionization equals batch gap-based sessionization") {
    val events = mkEvents(3000)
    val inDir = tmpDir("sess-in")
    writeOrdered(events, inDir, 3)

    val gapMs = 30L * 60 * 1000
    def sessionize(
        user: Long, evs: Iterator[Ev], state: GroupState[(Int, Long, Long)]): SessionAgg = {
      // state = (sessions, events, lastTs); single AvailableNow batch here,
      // so the state machinery is exercised but the fold sees all events
      val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.value))
      var (sessions, count, last) = state.getOption.getOrElse((0, 0L, Long.MinValue))
      sorted.foreach { e =>
        if (last == Long.MinValue || e.ts.getTime - last > gapMs) sessions += 1
        count += 1
        last = e.ts.getTime
      }
      state.update((sessions, count, last))
      SessionAgg(user, sessions, count)
    }

    val ckpt = tmpDir("sess-ckpt")
    val q = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir.toString)
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(sessionize)
      .writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .format("memory") // parquet sink rejects update mode
      .queryName("sess_out")
      .start()
    q.awaitTermination()

    val got = spark.table("sess_out")
      .groupBy($"user_id").agg(max($"n_sessions").as("n_sessions"), max($"n_events").as("n_events"))

    // batch oracle: same gap rule via window functions (q26 pattern)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"value")
    val batch = events.toDF()
      .withColumn("prev", lag($"ts", 1).over(w))
      .withColumn("new_s",
        when($"prev".isNull ||
          (unix_millis($"ts") - unix_millis($"prev")) > gapMs, 1).otherwise(0))
      .groupBy($"user_id")
      .agg(sum($"new_s").as("n_sessions"), count(lit(1)).as("n_events"))

    val mismatch = got.join(batch, Seq("user_id"))
      .filter(got("n_sessions") =!= batch("n_sessions") || got("n_events") =!= batch("n_events"))
    assert(got.count() == 20)
    assert(mismatch.isEmpty, "stateful sessionization disagrees with batch oracle")
  }

  test("stream-static broadcast dim join enriches every micro-batch (fraud_detector zone-lookup shape)") {
    // The reference enriches the trip stream with the static zone dim on
    // every micro-batch (fraud_detector.py zone lookup); the Spark-native
    // shape is a stream ⋈ broadcast(static) equi-join — stateless, no
    // watermark needed, dim re-broadcast per epoch.
    val events = mkEvents(1000)
    val inDir = tmpDir("dimjoin-in")
    writeOrdered(events, inDir, 3)

    val dim = (0L until 20L).map(u => (u, s"tier${u % 3}")).toDF("user_id", "tier")
    val outDir = tmpDir("dimjoin-out"); val ckpt = tmpDir("dimjoin-ckpt")
    val q = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir.toString)
      .join(broadcast(dim), Seq("user_id"), "left")
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir.toString)
      .start()
    q.awaitTermination()

    val got = spark.read.parquet(outDir.toString)
    assert(got.count() == events.size, "rows lost or duplicated by the stream-dim join")
    assert(got.filter($"tier".isNull).count() == 0, "dim lookup missed rows")
    val bad = got.filter($"tier" =!= concat(lit("tier"), ($"user_id" % 3).cast("string")))
    assert(bad.isEmpty, "dim attributes joined to the wrong key")
  }
}
