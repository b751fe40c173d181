package graft.analytics

import graft.SparkSpec

/** Physical-plan discipline checks (the "would this survive 100×" gate):
  * filters reach the parquet scan, projections prune the read schema,
  * dimension joins broadcast, top-k plans TakeOrderedAndProject, and the
  * hot paths stay inside WholeStageCodegen. Asserting on plans keeps a
  * regression from silently de-optimizing a query while its results stay
  * correct.
  */
class PlanQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = graft.SparkEntry.queries(q)(spark, dir)
    df.count() // finalize AQE so the plan string reflects execution
    df.queryExecution.executedPlan.toString
  }

  test("q11 OBT: dims broadcast by hint, fact-fact joins do NOT (dim contract)") {
    // Disable size-based auto-broadcast so the executed plan shows the
    // DECLARED join strategy: only bounded dims (nation ×2 role-playing)
    // carry broadcast hints; lineitem⋈orders⋈customer⋈supplier must
    // stay shuffle joins — a fact-side broadcast hint OOMs at 100×.
    Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .foreach(k => spark.conf.set(k, "-1"))
    try {
      val p = plan("q11_obt_join")
      val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
      val shuffles = ("SortMergeJoin".r.findAllIn(p).size
        + "ShuffledHashJoin".r.findAllIn(p).size)
      assert(broadcasts == 2, s"expected exactly 2 hinted dim broadcasts, got $broadcasts\n$p")
      assert(shuffles == 3, s"expected 3 shuffle joins for fact-scale sides, got $shuffles\n$p")
    } finally
      Seq("spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.autoBroadcastJoinThreshold")
        .foreach(k => spark.conf.unset(k))
  }

  test("q11 OBT: with AQE size heuristics on, small sides still broadcast locally") {
    // At sf0.001 every side is tiny — AQE should pick broadcasts on its
    // own, confirming the unhinted joins don't force a shuffle at small SF.
    val p = plan("q11_obt_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 4, s"AQE did not broadcast small sides: got $broadcasts\n$p")
  }

  test("q14 surrogate key: parquet scan prunes to the referenced columns") {
    val p = plan("q14_surrogate_key")
    val read = "ReadSchema: [^\n]+".r.findFirstIn(p).getOrElse("")
    assert(read.contains("o_orderkey"), read)
    assert(!read.contains("o_totalprice") && !read.contains("o_custkey"),
      s"unpruned scan: $read")
  }

  test("q01 rollup: only the five referenced lineitem columns are read") {
    // plan toString truncates ReadSchema — assert pruning (absence) plus
    // the first referenced columns
    val p = plan("q01_pricing_rollup")
    val read = "ReadSchema: [^\n]+".r.findFirstIn(p).getOrElse("")
    Seq("l_quantity", "l_returnflag").foreach(c => assert(read.contains(c), read))
    Seq("l_orderkey", "l_partkey", "l_suppkey").foreach(c =>
      assert(!read.contains(c), s"unpruned scan: $read"))
  }

  test("filter pushdown reaches the parquet scan") {
    import org.apache.spark.sql.functions._
    val df = graft.util.Tables.load(spark, dir, "lineitem")
      .filter(col("l_quantity") > 30.0)
      .select("l_orderkey", "l_quantity")
    val p = df.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*GreaterThan\\(l_quantity".r.findFirstIn(p).isDefined,
      s"filter not pushed: $p")
  }

  test("q24 ring buffer plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q24_ring_buffer")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q21 rule scoring stays inside whole-stage codegen (no UDF wall)") {
    // AQE reports "Found 0 subtrees" before finalization — disable it
    // for the static codegen inspection only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p = try {
      graft.SparkEntry.queries("q21_rule_score")(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert("Found \\d+ WholeStageCodegen subtrees".r.findFirstIn(p).exists(!_.contains("Found 0")), p.take(400))
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p.take(400))
  }

  test("q34 fingerprint: roll hash is codegen'd, no HOF fallback in the scan span") {
    // AQE prints no codegen markers before finalization — disable it for
    // the static codegen inspection only (same caveat as the q21 test)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p = try {
      graft.SparkEntry.queries("q34_fingerprint")(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // the custom expression replaced the aggregate(zip_with(...)) chain —
    // no interpreted higher-order functions left in the plan…
    assert(p.contains("string_roll_hash"), p.take(800))
    assert(!p.contains("zip_with") && !p.contains("aggregate("), p.take(800))
    // …and the project computing it sits inside a WholeStageCodegen span
    // ("* Project" + a codegen id in formatted mode)
    val starred = p.linesIterator.exists(l => l.contains("* Project"))
    val fused = "\\(\\d+\\) Project \\[codegen id".r.findFirstIn(p).isDefined
    assert(starred && fused, s"roll-hash project not fused into codegen:\n${p.take(1500)}")
  }

  test("q62 wide pivot: one agg shuffle plus the output sort only") {
    // conditional aggregation (not Dataset.pivot): the matrix is
    // built by a single hash aggregation — the wide shape costs the same
    // one shuffle as the long q23 at any scale
    val df = graft.SparkEntry.queries("q62_dow_hour_pivot")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected agg shuffle + sort only, got $exchanges exchanges\n${p.take(1200)}")
    assert(p.contains("HashAggregate"), p.take(600))
  }

  test("q63 histogram gate: threshold join broadcasts — no data-scale shuffle join or sort") {
    // the 100 TB shape: quantiles come from the per-(source, score)
    // histogram, thresholds broadcast back; the corpus itself is never
    // sorted or shuffle-joined
    val df = graft.SparkEntry.queries("q63_histogram_quantile_gate")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p.take(1500))
  }

  test("q52 embedding near-dup: LSH candidate join is an equi-join, never all-pairs") {
    // inspect the UN-cached pair plan — the memoized query only shows an
    // InMemoryTableScan over it
    val df = graft.analytics.DedupOps.embNearPairsPlan(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    // candidates come from the (table, bucket) equi-join; the vec_id <
    // inequality must ride as a post-join condition, not force a
    // cartesian/nested-loop
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the native codegen dot does the scoring
    assert(p.contains("long_array_dot"), s"native dot missing from near-dup scoring:\n$p")
    // and the memoized query path serves from a distributed source, never
    // a driver round-trip
    val q = graft.SparkEntry.queries("q52_embedding_neardup")(spark, dir)
    val qp = q.queryExecution.executedPlan.toString
    assert(!qp.contains("LocalTableScan"), s"pair set was collected to the driver:\n$qp")
  }

  test("q55 simhash near-dup: band join is an equi-join, never all-pairs") {
    val df = graft.analytics.DedupOps.simhashNearPairsPlan(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val qp = graft.SparkEntry.queries("q55_simhash_neardup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!qp.contains("LocalTableScan"), s"pair set was collected to the driver:\n$qp")
  }

  test("q35 LSH candidate generation contains no cartesian product") {
    val df = graft.SparkEntry.queries("q35_minhash_lsh")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q42 pipeline mart prunes the lineitem scan to referenced columns") {
    graft.analytics.Pipeline.reset()
    val p = plan("q42_pipeline_monthly")
    val reads = "ReadSchema: [^\n]+".r.findAllIn(p).toSeq.mkString("\n")
    // the OBT cache feeds the mart, but the underlying lineitem scan must
    // not read join-irrelevant wide columns
    assert(!reads.contains("l_partkey") && !reads.contains("l_suppkey"),
      s"unpruned pipeline scan: $reads")
    graft.analytics.Pipeline.reset()
  }

  test("q44 IVF: only the √n-row codebook broadcast is nested-loop; probe/pair joins are hash") {
    val df = graft.SparkEntry.queries("q44_ann_ivf")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    // the codebook cross join broadcasts ⌊√n⌋ sampled medoids — allowed;
    // the candidate (probe) and scoring joins must be equi-joins, never a
    // big-side cartesian
    assert(!p.contains("CartesianProduct"), p)
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl <= 2, s"unexpected nested-loop joins beyond the codebook: $bnl\n$p")
    // the probe join (assigned ⋈ probes on cell) and scoring joins stay
    // hash/merge equi-joins
    val equiJoins = "BroadcastHashJoin".r.findAllIn(p).size +
      "ShuffledHashJoin".r.findAllIn(p).size + "SortMergeJoin".r.findAllIn(p).size
    assert(equiJoins >= 3, s"expected equi-joins for probe+scoring, got $equiJoins\n$p")
  }

  test("q38 brute-force ANN: broadcast query side is bounded by a constant limit") {
    val df = graft.SparkEntry.queries("q38_ann_brute_topk")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    // the broadcast side must be capped by construction (limit K), not
    // grow as a fraction of the corpus
    assert(("TakeOrderedAndProject\\(limit=" + AnnOps.BruteQueryK).r.findFirstIn(p).isDefined,
      s"no constant-size cap on the broadcast query set:\n$p")
  }

  test("q35 LSH pairs stay distributed: no driver round-trip in the plan") {
    // A collect()-and-reparallelize would surface as a LocalTableScan of
    // the pair set; the memoized pair DataFrame must be an InMemory scan.
    val df = graft.SparkEntry.queries("q35_minhash_lsh")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("LocalTableScan"), s"pair set was collected to the driver:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("Exchange"),
      s"expected a distributed (cached or shuffled) pair source:\n$p")
  }

  test("q56 packing: exactly one data shuffle — the per-source window partition") {
    // The packer's cost model at 100 TB is a single hash exchange on the
    // shard key; any extra exchange is a regression. (The second exchange
    // in the plan is the presentation-only range sort.)
    val p = plan("q56_sequence_packing")
    val exchanges = "Exchange (hash|range)partitioning".r.findAllIn(p).toSeq
    assert(exchanges.count(_.contains("hash")) == 1,
      s"expected exactly 1 hash exchange (window on source), got:\n$p")
    assert(p.contains("hashpartitioning(source"), s"window not partitioned by source:\n$p")
  }

  test("q57 sampling: pure per-row predicate — no shuffle except the output sort") {
    val p = plan("q57_stratified_sample")
    assert(!p.contains("Exchange hashpartitioning"),
      s"hash sampler must not shuffle:\n$p")
  }

  test("q58 contamination: overlap join is an equi-join on the shingle hash, never all-pairs") {
    val p = plan("q58_contamination")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"contamination check degenerated to all-pairs:\n$p")
  }
}
