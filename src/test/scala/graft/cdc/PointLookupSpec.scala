package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Point-lookup laws (q77's engine path): base files are written
  * clustered (key-sorted within bucket) so their manifest key ranges are
  * tight and DISJOINT per bucket; `lookupKeys` prunes to the one range
  * file per bucket plus the delta tail; pruning never loses a row —
  * results equal the full-scan filter under updates, deletes and unknown
  * (legacy) stats.
  */
class PointLookupSpec extends SparkSpec {
  import spark.implicits._

  private def ev(lsn: Long, doc: String, toks: Seq[Int], op: String = Model.OpInsert) =
    (lsn, math.abs(doc.hashCode) % 3, op, doc, toks, toks.size, "web",
      null.asInstanceOf[java.sql.Timestamp])

  private val cols = Seq("lsn", "partition", "op", "doc_id", "tokens", "n_tok", "source", "ts")

  /** 200 keys in 4 buckets, compacted to tiny files → several clustered
    * base files per bucket.
    */
  private def fixture(name: String): SnapshotTable = {
    val t = new SnapshotTable(tmpDir(name).resolve("t").toString, 4)
    t.init(Model.tokenDocSchema)
    val docs = (0 until 200).map(i => f"k$i%04d")
    MergeEngine.merge(spark, t,
      docs.zipWithIndex.map { case (d, i) => ev(i.toLong, d, Seq(i)) }.toDF(cols: _*),
      "p", 0L)
    MergeEngine.compact(spark, t, targetFileBytes = 256)
    t
  }

  test("clustered layout: key ranges are recorded and disjoint within a bucket") {
    val t = fixture("lookup-layout")
    val m = t.manifest.get
    val bases = m.files.filterNot(_.isDelta)
    assert(bases.forall(f => f.minKey != null && f.maxKey != null),
      "every base file must carry footer key bounds")
    m.files.filterNot(_.isDelta).groupBy(_.bucket).foreach { case (b, fs) =>
      assert(fs.size > 1, s"bucket $b should split into multiple files (got ${fs.size})")
      val sorted = fs.sortBy(_.minKey)
      sorted.sliding(2).foreach {
        case Seq(a, c) =>
          assert(FileEntry.utf8Leq(a.maxKey, c.minKey) && a.maxKey != c.minKey,
            s"overlapping key ranges in bucket $b: [${a.minKey},${a.maxKey}] vs [${c.minKey},${c.maxKey}]")
        case _ => ()
      }
    }
  }

  test("lookup prunes to a sliver and equals the full-scan filter") {
    val t = fixture("lookup-prune")
    val m = t.manifest.get
    val keys = Seq("k0003", "k0117", "k0199")
    val byBucket = keys.toDF("doc_id")
      .select($"doc_id", SnapshotTable.bucketOf($"doc_id", m.numBuckets).as("b"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val buckets = byBucket.keySet
    val coveringAll = m.files.count(f => buckets.exists(f.covers))
    val selected = t.pruneForKeys(m, byBucket)
    assert(selected.size < coveringAll,
      s"key-range pruning ineffective: $coveringAll covering, ${selected.size} selected")
    assert(selected.size <= keys.size, "at most one clustered file per sought key")

    val got = t.lookupKeys(spark, keys).select("doc_id", "n_tok").as[(String, Int)]
      .collect().toSet
    val want = t.read(spark).filter($"doc_id".isin(keys: _*))
      .select("doc_id", "n_tok").as[(String, Int)].collect().toSet
    assert(got === want)
    assert(got.map(_._1) === keys.toSet)
  }

  test("lookup sees MOR updates and tombstones; unknown stats read conservatively") {
    val t = fixture("lookup-mor")
    MergeEngine.merge(spark, t,
      Seq(ev(500L, "k0003", Seq(9999), Model.OpUpdate),
        ev(501L, "k0117", Nil, Model.OpDelete)).toDF(cols: _*),
      "p", 1L)
    val got = t.lookupKeys(spark, Seq("k0003", "k0117", "k0042"))
      .select("doc_id", "tokens").as[(String, Seq[Int])].collect().toMap
    assert(got("k0003") === Seq(9999), "MOR update must win the lookup")
    assert(!got.contains("k0117"), "tombstone must drop the key")
    assert(got("k0042") === Seq(42))

    // legacy manifests (no key stats) are conservative, never wrong
    val m = t.manifest.get
    val noStats = m.copy(files = m.files.map(_.copy(minKey = null, maxKey = null)))
    val b42 = Seq("k0042").toDF("doc_id")
      .select(SnapshotTable.bucketOf($"doc_id", m.numBuckets).as("b"))
      .collect().head.getInt(0)
    val conservative = t.pruneForKeys(noStats, Map(b42 -> Seq("k0042")))
    assert(conservative.size === m.files.count(_.covers(b42)),
      "unknown key ranges must keep every bucket-covering file")
  }

  test("manifest key bounds survive a JSON round-trip (and null for legacy)") {
    val t = fixture("lookup-json")
    val m = t.manifest.get
    val rt = Manifest.fromJson(Manifest.toJson(m))
    assert(rt.files.map(f => (f.path, f.minKey, f.maxKey)) ===
      m.files.map(f => (f.path, f.minKey, f.maxKey)))
    // a pre-round-5 manifest JSON (no minKey/maxKey fields) parses to null
    val legacy = Manifest.toJson(m).replaceAll("\\s*\"(minKey|maxKey)\"\\s*:\\s*(\"[^\"]*\"|null),?", "")
    val lm = Manifest.fromJson(legacy)
    assert(lm.files.forall(f => f.minKey == null && f.maxKey == null))
  }
}
