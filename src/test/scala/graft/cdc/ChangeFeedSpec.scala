package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Change-feed laws: net per-key ops across multi-epoch windows
  * (insert+delete vanishes, delete+reinsert nets to U), pre/post images
  * from the right snapshots, O(changes) sourcing from the window's delta
  * files only, and loud refusal when the window crosses a non-MOR commit.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def ev(lsn: Long, doc: String, toks: Seq[Int], op: String = Model.OpInsert) =
    (lsn, math.abs(doc.hashCode) % 3, op, doc, toks, toks.size, "web",
      null.asInstanceOf[java.sql.Timestamp])

  private val cols = Seq("lsn", "partition", "op", "doc_id", "tokens", "n_tok", "source", "ts")

  test("net ops + pre/post images across a three-epoch window") {
    val t = new SnapshotTable(tmpDir("cdf").resolve("t").toString, 4)
    t.init(Model.tokenDocSchema)
    MergeEngine.merge(spark, t,
      (0 until 30).map(i => ev(i.toLong, s"k$i", Seq(i))).toDF(cols: _*), "q", 0L) // v1
    MergeEngine.merge(spark, t, Seq(
      ev(100L, "k1", Seq(101), Model.OpUpdate),
      ev(101L, "k2", Nil, Model.OpDelete),
      ev(102L, "k30", Seq(30))).toDF(cols: _*), "q", 1L)                           // v2
    MergeEngine.merge(spark, t, Seq(
      ev(200L, "k40", Seq(40)),
      ev(201L, "k40", Nil, Model.OpDelete),   // insert+delete inside window → no row
      ev(202L, "k3", Nil, Model.OpDelete)).toDF(cols: _*), "q", 2L)                // v3
    MergeEngine.merge(spark, t, Seq(
      ev(300L, "k3", Seq(333))).toDF(cols: _*), "q", 3L)                           // v4

    val feed = ChangeFeed.between(spark, t, 1L, 4L)
      .select($"doc_id", $"change_op", $"lsn",
        $"pre_image.tokens".as("pre_toks"), $"post_image.tokens".as("post_toks"))
      .as[(String, String, java.lang.Long, Seq[Int], Seq[Int])]
      .collect().map(r => r._1 -> r).toMap

    assert(feed.keySet === Set("k1", "k2", "k3", "k30"), s"got ${feed.keySet}")
    assert(feed("k1") === ("k1", "U", 100L, Seq(1), Seq(101)))
    assert(feed("k2")._2 === "D" && feed("k2")._4 === Seq(2) && feed("k2")._5 === null)
    assert(feed("k3") === ("k3", "U", 300L, Seq(3), Seq(333)),
      "delete+reinsert must net to an update")
    assert(feed("k30")._2 === "I" && feed("k30")._4 === null && feed("k30")._5 === Seq(30))

    // replaying the feed onto the FROM state reproduces the TO state
    val from = t.readVersion(spark, 1L).select("doc_id", "tokens")
      .as[(String, Seq[Int])].collect().toMap
    val applied = (from -- ChangeFeed.between(spark, t, 1L, 4L)
        .filter($"change_op" === "D").select("doc_id").as[String].collect()) ++
      ChangeFeed.between(spark, t, 1L, 4L).filter($"change_op" =!= "D")
        .select($"doc_id", $"post_image.tokens".as("t")).as[(String, Seq[Int])].collect()
    val to = t.read(spark).select("doc_id", "tokens").as[(String, Seq[Int])].collect().toMap
    assert(applied === to, "feed ∘ from-state must equal to-state")
  }

  test("a feed across a schema evolution conforms pre-images to the evolved shape") {
    val t = new SnapshotTable(tmpDir("cdf-evo").resolve("t").toString, 4)
    t.init(Model.tokenDocSchema)
    MergeEngine.merge(spark, t,
      (0 until 10).map(i => ev(i.toLong, s"k$i", Seq(i))).toDF(cols: _*), "q", 0L) // v1
    // the evolving epoch: widened n_tok + new lang column
    val evolved = Seq((100L, 0, "U", "k1", Seq(11), 1L, "web",
      null.asInstanceOf[java.sql.Timestamp], "en"))
      .toDF("lsn", "partition", "op", "doc_id", "tokens", "n_tok", "source", "ts", "lang")
    MergeEngine.merge(spark, t, evolved, "q", 1L)                                  // v2

    val feed = ChangeFeed.between(spark, t, 1L, 2L)
      .select($"doc_id", $"change_op",
        $"pre_image.lang".as("pre_lang"), $"post_image.lang".as("post_lang"),
        $"pre_image.n_tok".as("pre_n"), $"post_image.n_tok".as("post_n"))
      .as[(String, String, String, String, java.lang.Long, java.lang.Long)]
      .collect()
    assert(feed.toSeq === Seq(("k1", "U", null, "en", 1L, 1L)),
      s"pre-image must conform to the evolved schema (lang null, n_tok widened): ${feed.toSeq}")
  }

  test("a window crossing compaction or COW refuses loudly") {
    val t = new SnapshotTable(tmpDir("cdf-ref").resolve("t").toString, 4)
    t.init(Model.tokenDocSchema)
    MergeEngine.merge(spark, t,
      (0 until 10).map(i => ev(i.toLong, s"k$i", Seq(i))).toDF(cols: _*), "q", 0L) // v1
    MergeEngine.merge(spark, t,
      Seq(ev(100L, "k1", Seq(11), Model.OpUpdate)).toDF(cols: _*), "q", 1L)        // v2
    MergeEngine.compact(spark, t)                                                  // v3
    MergeEngine.merge(spark, t,
      Seq(ev(200L, "k2", Seq(22), Model.OpUpdate)).toDF(cols: _*), "q", 2L)        // v4

    intercept[ChangeFeed.UnsupportedWindowException](
      ChangeFeed.between(spark, t, 1L, 4L))
    // a window strictly after the compaction still works
    val ok = ChangeFeed.between(spark, t, 3L, 4L)
      .select($"doc_id", $"change_op").as[(String, String)].collect().toSeq
    assert(ok === Seq(("k2", "U")))

    // COW commits rewrite files too → same refusal
    MergeEngine.merge(spark, t,
      Seq(ev(300L, "k3", Seq(33), Model.OpUpdate)).toDF(cols: _*), "q", 3L,
      mode = MergeEngine.ModeCow)                                                  // v5
    intercept[ChangeFeed.UnsupportedWindowException](
      ChangeFeed.between(spark, t, 4L, 5L))
  }
}
