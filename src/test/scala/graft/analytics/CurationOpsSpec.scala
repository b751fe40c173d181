package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Law-style guarantees for the curation family, independent of the DuckDB
  * oracles (which replicate the computation): packing offsets tile the
  * token stream exactly, sampling is deterministic with nested thresholds
  * and on-target rates, contamination finds every planted leak with no
  * over-threshold false positive, and the quantile gate's threshold is a
  * true per-source cut.
  */
class CurationOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  /** Packing laws shared by q56 (raw documents) and q60 (CDC snapshot):
    * offsets tile each source's token stream contiguously and agree with
    * the budget arithmetic. `docKey` orders docs the way the window did.
    */
  private def assertTiling(name: String, docKey: org.apache.spark.sql.Row => Any): Unit = {
    implicit val anyOrd: Ordering[Any] = (a, b) => (a, b) match {
      case (x: Long, y: Long) => x.compareTo(y)
      case (x: String, y: String) => x.compareTo(y)
      case _ => fail(s"unexpected key types: $a / $b")
    }
    val rows = q(name)
      .select("source", "doc_id", "n_tok", "begin_off", "end_off",
        "seq_id", "off_in_seq", "spans_boundary")
      .collect()
      .groupBy(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach { case (src, docs) =>
      val sorted = docs.sortBy(docKey)
      // contiguity: first begins at 0, each begin = previous end
      assert(sorted.head.getLong(3) == 0L, s"$src starts at ${sorted.head.getLong(3)}")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(3) == a.getLong(4),
          s"$src gap: doc ${b.get(1)} begins ${b.getLong(3)} != prev end ${a.getLong(4)}")
        case _ =>
      }
      // offsets ↔ seq assignment consistent with the budget
      sorted.foreach { r =>
        val (begin, seq, off) = (r.getLong(3), r.getLong(5), r.getLong(6))
        assert(seq == begin / CurationOps.PackBudget && off == begin % CurationOps.PackBudget)
        val spans = (begin + r.getLong(2) - 1) / CurationOps.PackBudget > seq
        assert(r.getBoolean(7) == spans, s"$src doc ${r.get(1)} spans_boundary wrong")
      }
    }
    // fixture exercises both packer cases
    val all = rows.values.flatten.toSeq
    assert(all.count(_.getBoolean(7)) > 0, "no boundary-spanning docs at this budget")
    val multiDoc = all.groupBy(r => (r.getString(0), r.getLong(5))).values.count(_.size > 1)
    assert(multiDoc > 0, "no multi-doc sequences at this budget")
  }

  test("q56 packing: offsets tile the per-source token stream with no gap or overlap") {
    assertTiling("q56_sequence_packing", _.getLong(1))
  }

  test("q60 incremental repack: packing laws hold on the CDC snapshot; only dirty sources repacked") {
    assertTiling("q60_incremental_repack", _.getString(1))
    // dirty gating: repacked sources == sources with a surviving row whose
    // final LSN clears the threshold (derived from the changelog rules),
    // and the gate must exclude a real fraction of the corpus
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val maxDid = docs.agg(max("doc_id")).head().getLong(0)
    val expected = docs.filter(col("doc_id") % 17 =!= 0)
      .withColumn("lsn", when(col("doc_id") % 5 === 0, col("doc_id") * 3 + 1)
        .otherwise(col("doc_id") * 3))
      .filter(col("lsn") >= 3L * (maxDid - 10))
      .select("source").distinct().collect().map(_.getString(0)).toSet
    val got = q("q60_incremental_repack")
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(got == expected, s"dirty-source gate wrong: got $got expected $expected")
    val all = docs.select("source").distinct().count()
    assert(got.size < all, "gate excluded nothing — not incremental")
  }

  test("q57 sampling: deterministic, on-target per rate class, thresholds nested") {
    val a = q("q57_stratified_sample").collect()
    val b = q("q57_stratified_sample").collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted),
      "sample not reproducible across runs")

    // observed rate per target class stays within binomial noise
    val total = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("cls",
        regexp_extract(col("source"), "([0-9]+)$", 1).cast("int") % 4)
      .groupBy("cls").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val kept = q("q57_stratified_sample")
      .withColumn("cls",
        regexp_extract(col("source"), "([0-9]+)$", 1).cast("int") % 4)
      .groupBy("cls").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val targets = Map(0 -> 0.25, 1 -> 0.5, 2 -> 0.75, 3 -> 1.0)
    targets.foreach { case (cls, rate) =>
      val n = total(cls).toDouble
      val observed = kept.getOrElse(cls, 0L) / n
      val tol = if (rate == 1.0) 0.0 else 3 * math.sqrt(rate * (1 - rate) / n) + 0.01
      assert(math.abs(observed - rate) <= tol,
        s"class $cls rate $observed vs target $rate (n=$n, tol=$tol)")
    }

    // nested-threshold property of the hash sampler: the kept set at a
    // lower rate is a subset of the kept set at any higher rate
    import spark.implicits._
    val u = spark.read.parquet(s"$dir/documents.parquet")
      .select(graft.functions.XHash.hash32($"doc_id".cast("string"), "smp").as("u32"),
        $"doc_id")
    def keptAt(t: Long) = u.filter($"u32" < t).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val (s25, s50, s75) = (keptAt(1L << 30), keptAt(1L << 31), keptAt(3L << 30))
    assert(s25.subsetOf(s50) && s50.subsetOf(s75), "hash sample thresholds not nested")
  }

  test("q58 contamination: every planted leak found, no over-threshold false positive") {
    val rows = q("q58_contamination").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    val evalIds = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 97 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(evalIds.nonEmpty)
    evalIds.foreach { e =>
      // full copy: perfect overlap, flagged
      val full = rows.find(r => r._1 == e + CurationOps.FullLeakOffset && r._2 == e)
      assert(full.exists(r => r._5 == 1.0 && r._6), s"full leak of $e not flagged: $full")
      // half-prefix copy: partial overlap strictly between 0 and 1
      val half = rows.find(r => r._1 == e + CurationOps.HalfLeakOffset && r._2 == e)
      assert(half.exists(r => r._5 > 0.0 && r._5 < 1.0), s"half leak of $e not found: $half")
    }
    // nothing else crosses the contamination threshold
    val planted = evalIds.flatMap(e =>
      Seq(e + CurationOps.FullLeakOffset, e + CurationOps.HalfLeakOffset))
    rows.filter(_._6).foreach { r =>
      assert(planted.contains(r._1), s"false positive: train doc ${r._1} flagged vs ${r._2}")
    }
  }

  test("q59 quantile gate: per-source cut keeps the top ~75% with a clean threshold") {
    val bySrc = q("q59_quality_quantile_gate")
      .select("source", "score", "pct_rank", "kept")
      .collect().groupBy(_.getString(0))
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, rows) =>
      val n = rows.length
      val kept = rows.filter(_.getBoolean(3))
      val dropped = rows.filterNot(_.getBoolean(3))
      // percent_rank >= 0.25 keeps exactly n - ceil(0.25*(n-1)) rows
      val expected = n - math.ceil(0.25 * (n - 1)).toInt
      assert(kept.length == expected, s"$src kept ${kept.length}, expected $expected of $n")
      // threshold is a true cut in score order (ties broken by doc_id may
      // straddle, so >= not >)
      if (dropped.nonEmpty)
        assert(kept.map(_.getLong(1)).min >= dropped.map(_.getLong(1)).max,
          s"$src kept a doc below a dropped doc's score")
    }
  }

  test("q63 histogram gate contains the exact q59 gate; extras only at the boundary tie group") {
    // the histogram quantile cannot split a tie group, so its kept set is
    // the exact gate's kept set plus (at most) the rest of the threshold
    // score's tie group — never a doc below the threshold
    val exactKept = q("q59_quality_quantile_gate")
      .filter(org.apache.spark.sql.functions.col("kept"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hist = q("q63_histogram_quantile_gate")
      .select("doc_id", "score", "threshold", "kept").collect()
    val histKept = hist.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(exactKept.subsetOf(histKept),
      s"histogram gate dropped ${(exactKept -- histKept).size} docs the exact gate keeps")
    val extras = histKept -- exactKept
    val scoreOf = hist.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    extras.foreach { d =>
      val (score, threshold) = scoreOf(d)
      assert(score == threshold,
        s"non-boundary extra doc $d: score $score vs threshold $threshold")
    }
    // and the gate still behaves as a cut: kept iff score >= threshold
    hist.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(1) >= r.getLong(2)), r.toString)
    }
  }
}
