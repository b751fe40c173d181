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

  test("q11 OBT: all five dimension joins are broadcast hash joins") {
    val p = plan("q11_obt_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 5, s"expected >=5 broadcast joins, got $broadcasts\n$p")
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to SMJ")
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

  test("q35 LSH candidate generation contains no cartesian product") {
    val df = graft.SparkEntry.queries("q35_minhash_lsh")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
