package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The composed medallion pipeline: layered gates fire on violations, the
  * OBT is materialized once and reused by every mart (dbt `table`
  * materialization analog), and the marts agree with their independent
  * SQL re-derivations (driver oracle q42/q43 covers the hashes; this spec
  * covers the composition mechanics).
  */
class PipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("both marts scan the cached OBT (computed once, not re-derived per mart)") {
    Pipeline.reset()
    val marts = Pipeline.run(spark, dir)
    assert(marts.obt.storageLevel.useMemory, "OBT is not persisted")
    // each downstream mart must read the materialization, not re-join
    Seq(marts.aggMonthly, marts.insightNationMix).foreach { m =>
      val p = m.queryExecution.executedPlan.toString
      assert(p.contains("InMemoryTableScan"), s"mart recomputed the OBT:\n$p")
    }
    // and q42/q43 share the same memoized run
    assert(Pipeline.run(spark, dir).obt eq marts.obt)
    Pipeline.reset()
  }

  test("dbt-test gate analogs return violating rows and fail the layer") {
    import spark.implicits._
    val good = Seq((1L, "A"), (2L, "N")).toDF("k", "flag")
    val bad = Seq((1L, "A"), (1L, "X"), (3L, null.asInstanceOf[String])).toDF("k", "flag")

    assert(Pipeline.Checks.notNull(good, Seq("flag")).isEmpty)
    assert(Pipeline.Checks.notNull(bad, Seq("flag")).count() == 1)
    assert(Pipeline.Checks.unique(good, Seq("k")).isEmpty)
    assert(Pipeline.Checks.unique(bad, Seq("k")).count() == 1)
    assert(Pipeline.Checks.acceptedValues(good, "flag", Seq("A", "N", "R")).isEmpty)
    assert(Pipeline.Checks.acceptedValues(bad.na.drop(), "flag", Seq("A", "N", "R")).count() == 1)

    val e = intercept[RuntimeException] {
      Pipeline.Checks.gate("unit", "not_null_flag" -> Pipeline.Checks.notNull(bad, Seq("flag")))
    }
    assert(e.getMessage.contains("unit") && e.getMessage.contains("not_null_flag"))
  }

  test("single-pass gate folds all layer tests into one scan and names the failing test") {
    import spark.implicits._
    val bad = Seq((1L, "A", 0.5), (2L, "X", -0.1)).toDF("k", "flag", "disc")
    // passing case: no exception
    Pipeline.Checks.gateOnePass("unit", bad, "not_null_k" -> col("k").isNull)
    // failing case names the first violated test with a count and example
    val e = intercept[RuntimeException] {
      Pipeline.Checks.gateOnePass("unit", bad,
        "not_null_k" -> col("k").isNull,
        "accepted_flag" -> !col("flag").isin("A", "N", "R"),
        "disc_in_range" -> (col("disc") < 0.0))
    }
    assert(e.getMessage.contains("accepted_flag") && e.getMessage.contains("1 violations"),
      e.getMessage)
  }

  test("approx uniqueness warn-gate: fires on duplicates, silent on unique keys, one scan") {
    import spark.implicits._
    // 200 rows over 50 distinct (order_key, line_no) pairs → 150 dups
    val dups = (1 to 200).map(i => ((i % 50).toLong, i % 5)).toDF("order_key", "line_no")
    val est = Pipeline.Checks.gateOnePassApproxUnique("unit", dups,
      Seq("order_key", "line_no"), "not_null_k" -> col("order_key").isNull)
    assert(est > 100, s"approx dup signal missed seeded duplicates: $est")
    // unique keys: under the noise floor → 0, no warn
    val uniq = (1 to 200).map(i => (i.toLong, 1)).toDF("order_key", "line_no")
    assert(Pipeline.Checks.gateOnePassApproxUnique("unit", uniq,
      Seq("order_key", "line_no"), "not_null_k" -> col("order_key").isNull) == 0L)
    // error-severity predicates folded into the same scan still fail hard
    val e = intercept[RuntimeException] {
      Pipeline.Checks.gateOnePassApproxUnique("unit",
        dups.withColumn("order_key", lit(null).cast("long")),
        Seq("order_key", "line_no"), "not_null_k" -> col("order_key").isNull)
    }
    assert(e.getMessage.contains("not_null_k"), e.getMessage)
  }

  test("marts are consistent with each other (same validated row universe)") {
    Pipeline.reset()
    val marts = Pipeline.run(spark, dir)
    val monthlyLines = marts.aggMonthly.agg(sum("n_lines")).head().getLong(0)
    val insightLines = marts.insightNationMix.agg(sum("n_lines")).head().getLong(0)
    assert(monthlyLines == insightLines, s"$monthlyLines != $insightLines")
    Pipeline.reset()
  }
}
