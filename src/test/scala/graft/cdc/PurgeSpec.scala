package graft.cdc

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten erasure laws (q76's engine path): the purge
  * rewrites ONLY the buckets the keys hash to (deltas covering them fold
  * in), carries every other file forward by identity, keeps older
  * snapshots readable until expiry, and after `expireSnapshots` the
  * superseded files are physically gone.
  */
class PurgeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(lsn: Long, doc: String, toks: Seq[Int], op: String = Model.OpInsert) =
    (lsn, math.abs(doc.hashCode) % 3, op, doc, toks, toks.size, "web",
      null.asInstanceOf[java.sql.Timestamp])

  private val cols = Seq("lsn", "partition", "op", "doc_id", "tokens", "n_tok", "source", "ts")

  test("purge: touched-bucket rewrite only, identity carry, physical erasure after expiry") {
    val t = new SnapshotTable(tmpDir("purge").resolve("t").toString, 8)
    t.init(Model.tokenDocSchema)
    val docs = (0 until 64).map(i => s"k$i")
    MergeEngine.merge(spark, t,
      docs.zipWithIndex.map { case (d, i) => ev(i.toLong, d, Seq(i)) }.toDF(cols: _*),
      "p", 0L)
    MergeEngine.compact(spark, t) // base files per bucket
    // MOR deltas on a few keys — a delta covering a touched bucket must
    // fold into the purge rewrite, not be orphaned
    MergeEngine.merge(spark, t,
      Seq(ev(100L, "k3", Seq(103)), ev(101L, "k40", Seq(140))).toDF(cols: _*),
      "p", 1L)
    val before = t.manifest.get
    assert(before.files.exists(_.isDelta), "fixture should carry MOR deltas")

    val keys = Seq("k3", "k17").toDF("doc_id")
    val res = MergeEngine.purgeKeys(spark, t, keys).get

    // purged keys gone, everything else intact (k40's delta value survives)
    val after = t.read(spark)
    assert(after.filter($"doc_id".isin("k3", "k17")).count() === 0L)
    assert(after.count() === 62L)
    assert(after.filter($"doc_id" === "k40" && $"tokens" === Array(140)).count() === 1L)

    // every file NOT covering a rewritten bucket carried forward by PATH
    val mAfter = t.manifest.get
    val afterPaths = mAfter.files.map(_.path).toSet
    val untouched = before.files.filterNot(f => res.buckets.exists(f.covers))
    assert(untouched.nonEmpty, "fixture should leave untouched buckets")
    untouched.foreach(f => assert(afterPaths.contains(f.path),
      s"untouched file rewritten: ${f.path}"))
    // and no pre-purge file covering a rewritten bucket survived
    mAfter.files.filter(f => res.buckets.exists(f.covers)).foreach(f =>
      assert(!before.files.map(_.path).contains(f.path), s"stale file kept: ${f.path}"))

    // older snapshot still shows the purged keys (retention) until expiry
    assert(t.readVersion(spark, before.version)
      .filter($"doc_id".isin("k3", "k17")).count() === 2L)
    t.expireSnapshots(keepLast = 1, minAgeMs = 0L)
    res.supersededFiles.foreach(p =>
      assert(!Files.exists(Paths.get(p)), s"purged-row file still on disk: $p"))
    intercept[IllegalArgumentException](t.readVersion(spark, before.version))
    assert(t.read(spark).count() === 62L)
  }

  test("purging absent keys is a data no-op (file shape may still fold deltas)") {
    val t = new SnapshotTable(tmpDir("purge-noop").resolve("t").toString, 8)
    t.init(Model.tokenDocSchema)
    MergeEngine.merge(spark, t,
      (0 until 16).map(i => ev(i.toLong, s"k$i", Seq(i))).toDF(cols: _*), "p", 0L)
    val beforeRows = t.read(spark).orderBy("doc_id").collect()
    MergeEngine.purgeKeys(spark, t, Seq("nope").toDF("doc_id"))
    assert(t.read(spark).orderBy("doc_id").collect().sameElements(beforeRows))
  }
}
