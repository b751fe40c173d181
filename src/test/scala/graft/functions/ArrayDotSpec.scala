package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[LongArrayDot]]: the codegen'd dot product must agree exactly with the
  * higher-order-function formulation it replaced, in both the interpreted
  * (nullSafeEval) and compiled (doGenCode) paths, and be reachable from
  * SQL text via [[graft.GraftExtensions]]. Property draws use seeded
  * Random (scalatestplus-scalacheck isn't in the offline cache).
  */
class ArrayDotSpec extends SparkSpec {

  test("dotLong == aggregate(zip_with(...)) on random long arrays (codegen on and off)") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242L)
    // full-semantics parity: unequal lengths (zip_with null-pads → the
    // aggregate goes NULL, and so must LongArrayDot) and occasional null
    // ELEMENTS are both included in the draws
    def arr(n: Int): List[Option[Long]] = List.fill(n)(
      if (rnd.nextInt(40) == 0) None else Some(rnd.nextLong() % 2000))
    val pairs = List.fill(300) {
      val n = rnd.nextInt(81)
      val m = if (rnd.nextInt(5) == 0) rnd.nextInt(81) else n
      (arr(n), arr(m))
    }
    val df = pairs.toDF("a", "b")
    val hof = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    Seq("CODEGEN_ONLY", "NO_CODEGEN").foreach { mode =>
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val rows = df.select(ArrayDot.dotLong($"a", $"b").as("fast"), hof.as("ref"))
          .collect()
        rows.foreach { r =>
          assert(r.isNullAt(0) == r.isNullAt(1), s"mode=$mode null divergence: $r")
          if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1), s"mode=$mode $r")
        }
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null arrays, null elements, and length mismatch all propagate null; empty gives 0") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(Some(1L), Some(2L))), None: Option[Seq[Option[Long]]]),
      (None: Option[Seq[Option[Long]]], Some(Seq(Some(3L)))),
      (Some(Seq.empty[Option[Long]]), Some(Seq.empty[Option[Long]])),
      (Some(Seq(Some(1L), None)), Some(Seq(Some(2L), Some(2L)))),
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(3L))))
    ).toDF("a", "b")
    val out = df.select(ArrayDot.dotLong($"a", $"b")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq == Seq(None, None, Some(0L), None, None))
  }

  test("SQL registration via GraftExtensions: long_array_dot callable from SQL text") {
    val r = spark.sql(
      "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head()
    assert(r.getLong(0) == 32L)
  }

  test("type check rejects non-bigint arrays") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
        .select(ArrayDot.dotLong($"a", $"b")).collect()
    }
    assert(err.getMessage.contains("long_array_dot") ||
      err.getMessage.toLowerCase.contains("array<bigint>"), err.getMessage)
  }

  test("ANN hot path stays codegen: scoring plan has no CodegenFallback HOF dot") {
    val df = graft.SparkEntry.queries("q38_ann_brute_topk")(spark, "/root/testdata/sf0.001")
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("long_array_dot"), s"expected the native dot in the plan:\n$p")
    assert(!p.toLowerCase.contains("zip_with") && !p.toLowerCase.contains("zipwith"),
      s"HOF dot survived in the hot path:\n$p")
  }
}
