package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Result-QUALITY guarantees for the approximate similarity paths — the
  * hash gate proves each query equals its own oracle, but q52's oracle
  * replicates the LSH candidate generation, so a recall miss there would
  * still hash-match; these assertions are independent of the oracles.
  *
  * Context for the thresholds: the synthetic embeddings are near-uniform
  * (true top-3 neighbors sit at cosine ≈ 0.4–0.5), which is the HARD
  * regime for approximate search. Hyperplane LSH by design only fires on
  * genuinely close vectors (collision prob per 12-plane table at 65° is
  * ~0.5%), so its recall target is the near-dup tier (cosine → 1), where
  * it must be perfect; IVF multi-probe targets moderate similarity and
  * must beat chance by a wide margin even here.
  */
class AnnQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def pairs(q: String, maxRank: Int): Set[(Long, Long)] =
    graft.SparkEntry.queries(q)(spark, dir)
      .filter(col("rank") <= maxRank)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF multi-probe recall@3 vs exact top-3 is >= 0.5 on uniform data (measured 0.6)") {
    val exact = pairs("q38_ann_brute_topk", maxRank = 3)
    val ivf = pairs("q44_ann_ivf", maxRank = 3)
    assert(exact.nonEmpty)
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@3 degraded: $recall (${ivf.intersect(exact).size}/${exact.size})")
  }

  test("embedding near-dup recall is PERFECT on planted pairs, with zero false positives") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q52_embedding_neardup")(spark, dir)
      .select("dropped_id", "kept_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val planted = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter($"vec_id" % 40 === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    // every planted near-copy (id+1000000) is dropped...
    assert(out.map(_._1).toSet == planted.map(_ + 1000000L),
      s"missed/extra near-dups: found ${out.length}, planted ${planted.size}")
    // ...and each keeps exactly its source (no random-pair false positive
    // ever crosses the 0.995 threshold)
    out.foreach { case (dropped, kept) =>
      assert(kept == dropped - 1000000L, s"wrong survivor for $dropped: $kept")
    }
  }

  test("simhash near-dup recall >= 0.85 on planted lexical near-copies (measured 0.875)") {
    import spark.implicits._
    val dropped = graft.SparkEntry.queries("q55_simhash_neardup")(spark, dir)
      .select("dropped_id").collect().map(_.getLong(0)).toSet
    // planted near-copies: doc_id%7 with >=4 words, copied to id+1000000
    // with the last word dropped (DedupOps corpus rules)
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" % 7 === 0 &&
        size(filter(split($"text", " "), w => length(w) > 0)) >= 4)
      .select("doc_id").collect().map(_.getLong(0) + 1000000L).toSet
    assert(planted.nonEmpty)
    val recall = dropped.intersect(planted).size.toDouble / planted.size
    // dropping one word flips ~0-3 of 60 bits for most docs; the tail
    // beyond hamming 3 is simhash's inherent miss rate at this radius
    assert(recall >= 0.85, s"simhash near-dup recall degraded: $recall")
  }
}
