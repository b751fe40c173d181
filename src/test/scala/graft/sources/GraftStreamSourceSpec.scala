package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.cdc.{ChangeFeed, MergeEngine, Model, SnapshotTable}

/** `readStream.format("graft")` laws: offsets are snapshot versions (a
  * batch is exactly one version window's change feed), checkpoint resume
  * consumes only NEW windows, and a window crossing maintenance fails
  * the stream loudly instead of under-reporting.
  */
class GraftStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def ev(lsn: Long, doc: String, toks: Seq[Int], op: String = Model.OpInsert) =
    (lsn, math.abs(doc.hashCode) % 3, op, doc, toks, toks.size, "web",
      null.asInstanceOf[java.sql.Timestamp])

  private val cols = Seq("lsn", "partition", "op", "doc_id", "tokens", "n_tok", "source", "ts")

  test("stream = change feed per version window; resume reads only new windows") {
    val t = new SnapshotTable(tmpDir("gss").resolve("t").toString, 4)
    t.init(Model.tokenDocSchema)
    MergeEngine.merge(spark, t,
      (0 until 20).map(i => ev(i.toLong, s"k$i", Seq(i))).toDF(cols: _*), "q", 0L) // v1
    MergeEngine.merge(spark, t, Seq(
      ev(100L, "k1", Seq(101), Model.OpUpdate),
      ev(101L, "k2", Nil, Model.OpDelete)).toDF(cols: _*), "q", 1L)                // v2

    val ckpt = tmpDir("gss-ckpt").toString
    // memory sink cannot recover a checkpoint; collect via foreachBatch
    def runOnce(): Seq[(String, String, Seq[Int], Seq[Int])] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[(String, String, Seq[Int], Seq[Int])]
      val q = spark.readStream.format("graft")
        .option("startVersion", 1L).load(t.root)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          got.synchronized {
            got ++= df
              .select(col("doc_id"), col("change_op"),
                col("pre_image.tokens").as("pre"), col("post_image.tokens").as("post"))
              .as[(String, String, Seq[Int], Seq[Int])].collect()
          }
          ()
        }
        .start()
      q.awaitTermination()
      got.toSeq
    }

    val first = runOnce().map(r => r._1 -> r).toMap
    assert(first.keySet === Set("k1", "k2"))
    assert(first("k1") === ("k1", "U", Seq(1), Seq(101)))
    assert(first("k2")._2 === "D" && first("k2")._4 === null)

    // new commit after the checkpointed offset → resume sees ONLY it
    MergeEngine.merge(spark, t, Seq(ev(200L, "k99", Seq(99))).toDF(cols: _*), "q", 2L) // v3
    val second = runOnce().map(r => (r._1, r._2))
    assert(second === Seq(("k99", "I")), s"resume must read only the new window, got $second")
  }

  test("crash-restart without startVersion consumes commits made while down") {
    // the default startVersion ("current at first start") must only apply
    // when no checkpoint exists: a restarted stream resumes from its
    // checkpointed offset and must deliver every version committed while
    // it was down, not stall until some future commit
    val t = new SnapshotTable(tmpDir("gss-r").resolve("t").toString, 4)
    t.init(Model.tokenDocSchema)
    MergeEngine.merge(spark, t,
      (0 until 5).map(i => ev(i.toLong, s"k$i", Seq(i))).toDF(cols: _*), "q", 0L) // v1
    val ckpt = tmpDir("gss-r-ckpt").toString
    def drain(): Seq[(String, String)] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val q = spark.readStream.format("graft").load(t.root) // NO startVersion
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          got.synchronized {
            got ++= df.select(col("doc_id"), col("change_op"))
              .as[(String, String)].collect()
          }
          ()
        }
        .start()
      q.awaitTermination()
      got.toSeq
    }
    assert(drain().isEmpty, "first start defaults to current version: no backlog")
    // committed while the stream is down
    MergeEngine.merge(spark, t, Seq(ev(50L, "kNew", Seq(7))).toDF(cols: _*), "q", 1L) // v2
    assert(drain() === Seq(("kNew", "I")),
      "restart must deliver the version committed while the stream was down")
  }

  test("mid-stream schema evolution fails the batch loudly") {
    // a LONG-RUNNING source captures the feed schema at creation; a batch
    // whose TO-version carries an evolved schema must fail loudly rather
    // than stamp evolved image structs onto the stale layout
    val t = new SnapshotTable(tmpDir("gss-e").resolve("t").toString, 4)
    t.init(Model.tokenDocSchema)
    MergeEngine.merge(spark, t,
      (0 until 5).map(i => ev(i.toLong, s"k$i", Seq(i))).toDF(cols: _*), "q", 0L) // v1
    val src = new org.apache.spark.sql.graft.GraftStreamSource(
      spark.sqlContext, t, startVersion = 1L,
      org.apache.spark.sql.graft.GraftStreamSource.feedSchema(t))
    // evolve mid-stream: a new column arrives through the merge path
    val evolved = Seq((10L, 0, Model.OpUpdate, "k1", Seq(101), 1, "web",
      null.asInstanceOf[java.sql.Timestamp], "en"))
      .toDF((cols :+ "lang"): _*)
    MergeEngine.merge(spark, t, evolved, "q", 1L) // v2, evolved schema
    val e = intercept[IllegalStateException](src.getBatch(None,
      org.apache.spark.sql.execution.streaming.runtime.LongOffset(2L)))
    assert(e.getMessage.contains("schema evolved"), e.getMessage)
  }

  test("a window crossing maintenance fails the stream loudly") {
    val t = new SnapshotTable(tmpDir("gss-m").resolve("t").toString, 4)
    t.init(Model.tokenDocSchema)
    MergeEngine.merge(spark, t,
      (0 until 10).map(i => ev(i.toLong, s"k$i", Seq(i))).toDF(cols: _*), "q", 0L) // v1
    MergeEngine.compact(spark, t)                                                 // v2
    val q = spark.readStream.format("graft")
      .option("startVersion", 1L).load(t.root)
      .writeStream.format("memory").queryName("gss_c")
      .option("checkpointLocation", tmpDir("gss-m-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](q.awaitTermination())
    def causes(x: Throwable): List[Throwable] =
      Option(x).map(c => c :: causes(c.getCause)).getOrElse(Nil)
    assert(causes(e).exists(_.isInstanceOf[ChangeFeed.UnsupportedWindowException]),
      s"expected UnsupportedWindowException in cause chain, got: $e")
  }
}
