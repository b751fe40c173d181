package graft.cdc

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Delta-manifest laws (the O(epoch)-metadata commit form): between
  * checkpoints a commit's manifest bytes scale with the EPOCH, not the
  * table; resolution through the chain reproduces the exact full state
  * (fresh handles included); checkpoint cadence holds; snapshot expiry
  * chain-retains exactly the manifests a retained delta needs and GCs
  * them once unreferenced.
  */
class ManifestDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def ev(lsn: Long, doc: String, toks: Seq[Int], op: String = Model.OpInsert) =
    (lsn, math.abs(doc.hashCode) % 3, op, doc, toks, toks.size, "web",
      null.asInstanceOf[java.sql.Timestamp])

  private val cols = Seq("lsn", "partition", "op", "doc_id", "tokens", "n_tok", "source", "ts")

  private def manifestBytes(t: SnapshotTable, v: Long): Long =
    Files.size(Paths.get(t.root).resolve(s"manifests/v$v.json"))

  private def rawJson(t: SnapshotTable, v: Long): String =
    new String(Files.readAllBytes(Paths.get(t.root).resolve(s"manifests/v$v.json")),
      StandardCharsets.UTF_8)

  test("per-epoch manifest bytes are O(epoch), not O(table); cadence checkpoints") {
    val t = new SnapshotTable(tmpDir("mdelta").resolve("t").toString, 8,
      manifestCheckpointEvery = 4)
    t.init(Model.tokenDocSchema)
    // a table with MANY base files (v1 bulk insert, v2 tiny-target
    // compact), then single-key epochs: a delta manifest must not carry
    // the accumulated file list a checkpoint does
    MergeEngine.merge(spark, t,
      (0 until 300).map(i => ev(i.toLong, f"doc-$i%04d", Seq(i))).toDF(cols: _*),
      "q", 1L)
    MergeEngine.compact(spark, t, targetFileBytes = 512)
    (2 to 9).foreach { k =>
      MergeEngine.merge(spark, t,
        Seq(ev(1000L + k, s"new-$k", Seq(k))).toDF(cols: _*), "q", k.toLong)
    }
    val m = t.manifest.get
    assert(m.version === 10L)
    assert(m.files.size > 30, s"fixture should carry many files, got ${m.files.size}")
    // delta versions carry filesAdded; checkpoint versions (4, 8) carry files
    (1L to 10L).foreach { v =>
      val isCkpt = v % 4 == 0
      assert(Manifest.parentRefOf(rawJson(t, v)).isEmpty === isCkpt,
        s"v$v expected ${if (isCkpt) "checkpoint" else "delta"}")
    }
    // the single-key delta at v10 must be a sliver of the v8 checkpoint,
    // which carries the whole file list (metrics overhead is shared)
    assert(manifestBytes(t, 10L) < manifestBytes(t, 8L) / 2,
      s"delta v10 ${manifestBytes(t, 10L)} B vs checkpoint v8 ${manifestBytes(t, 8L)} B: " +
        "delta size must not track accumulated file count")
  }

  test("fresh handles resolve the chain to the identical state") {
    val dir = tmpDir("mdelta-res").resolve("t").toString
    val t = new SnapshotTable(dir, 8, manifestCheckpointEvery = 4)
    t.init(Model.tokenDocSchema)
    // per-partition LSNs stay monotone: epoch k inserts doc-k at 10k and
    // updates doc-(k-1) at 10k+1
    (1 to 7).foreach { k =>
      MergeEngine.merge(spark, t,
        Seq(ev(10L * k, s"doc-$k", Seq(k)),
          ev(10L * k + 1, s"doc-${k - 1}", Seq(k * 10), Model.OpUpdate)).toDF(cols: _*),
        "q", k.toLong)
    }
    MergeEngine.compact(spark, t)
    val fresh = new SnapshotTable(dir, 8, manifestCheckpointEvery = 4)
    assert(fresh.manifest.get.files.map(_.path).sorted ===
      t.manifest.get.files.map(_.path).sorted)
    val got = fresh.read(spark).select("doc_id", "tokens").as[(String, Seq[Int])]
      .collect().toMap
    (1 to 6).foreach(k => assert(got(s"doc-$k") === Seq((k + 1) * 10), s"doc-$k"))
    assert(got("doc-0") === Seq(10) && got("doc-7") === Seq(7))
    // time travel through delta versions works (after epoch 3: docs 0..3)
    assert(fresh.readVersion(spark, 3L).count() === 4L)
  }

  test("expiry chain-retains what retained deltas need, fails expired time travel, GCs later") {
    val dir = tmpDir("mdelta-exp").resolve("t").toString
    val t = new SnapshotTable(dir, 8, manifestCheckpointEvery = 4)
    t.init(Model.tokenDocSchema)
    (1 to 7).foreach { k =>
      MergeEngine.merge(spark, t,
        Seq(ev(k.toLong, s"doc-$k", Seq(k))).toDF(cols: _*), "q", k.toLong)
    }
    // keep v6..v7: v7,v6 are deltas on v5→v4(checkpoint); chain v5,v4 must survive
    t.expireSnapshots(keepLast = 2, minAgeMs = 0L)
    val chainDir = Paths.get(dir).resolve("manifests/chain")
    assert(Files.exists(chainDir.resolve("v5.json")) && Files.exists(chainDir.resolve("v4.json")),
      "expired chain parents must be retained under manifests/chain/")
    // expired versions fail time travel fast even when chain-kept
    intercept[IllegalArgumentException](t.manifestAt(5L))
    // a FRESH handle (cold cache) still resolves current through the chain
    val fresh = new SnapshotTable(dir, 8, manifestCheckpointEvery = 4)
    assert(fresh.read(spark).count() === 7L)

    // advance past the next checkpoint; re-expiry drops the stale chain
    (8 to 9).foreach { k =>
      MergeEngine.merge(spark, fresh,
        Seq(ev(k.toLong, s"doc-$k", Seq(k))).toDF(cols: _*), "q", k.toLong)
    }
    fresh.expireSnapshots(keepLast = 2, minAgeMs = 0L)
    assert(!Files.exists(chainDir.resolve("v5.json")) && !Files.exists(chainDir.resolve("v4.json")),
      "chain files must be GC'd once no retained manifest needs them")
    assert(new SnapshotTable(dir, 8).read(spark).count() === 9L)
  }

  test("delta encoding falls back to a full checkpoint when carried entries mismatch") {
    val t = new SnapshotTable(tmpDir("mdelta-fb").resolve("t").toString, 8)
    t.init(Model.tokenDocSchema)
    MergeEngine.merge(spark, t,
      Seq(ev(1L, "a", Seq(1))).toDF(cols: _*), "q", 1L)
    val m = t.manifest.get
    val mutated = m.copy(version = m.version + 1, parentVersion = m.version,
      files = m.files.map(_.copy(rows = 999L)))
    assert(Manifest.toJsonDelta(mutated, m).isEmpty,
      "a carried entry that changed must force a full manifest")
    // and an honest child delta round-trips through resolve()
    val child = m.copy(version = m.version + 1, parentVersion = m.version,
      files = m.files :+ m.files.head.copy(path = m.files.head.path + ".x"))
    val js = Manifest.toJsonDelta(child, m).get
    val resolved = Manifest.resolve(js, v => { assert(v === m.version); m })
    assert(resolved.files.toSet === child.files.toSet)
    assert(resolved.fences === child.fences && resolved.watermarks === child.watermarks)
  }
}
