package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[StringRollHash]]: the codegen'd rolling checksum must agree exactly
  * with the higher-order-function formulation it replaced (q34's original
  * `aggregate(zip_with(split(text,''), sequence(1, length(text)), ...))`)
  * in both the interpreted and compiled paths, across ASCII and
  * multi-byte code points, and be reachable from SQL text.
  */
class StringRollHashSpec extends SparkSpec {

  private def hofRoll = {
    val chars = split(col("text"), "")
    aggregate(
      zip_with(chars, sequence(lit(1), length(col("text"))),
        (c, i) => ascii(c).cast("long") * i.cast("long")),
      lit(0L), (acc, x) => acc + x)
  }

  test("matches the HOF formulation on ASCII, accents, CJK and surrogate pairs (codegen on and off)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3434L)
    val alphabet = "abc XYZ09,.;éüñ商店日本語𝄞😀"
    // "" is excluded from HOF parity: sequence(1, 0)/zip_with null-poison
    // the aggregate there, an artifact — StringRollHash is total (0) and
    // q34 applies the null-on-empty envelope itself to match DuckDB.
    val docs = List.fill(200)(
      List.fill(1 + rnd.nextInt(120))(alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      List("a", "é", "…", "𝄞clef")
    val df = docs.toDF("text")
    Seq("CODEGEN_ONLY", "NO_CODEGEN").foreach { mode =>
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val rows = df.select(col("text"), RollHash.rollHash(col("text")).as("fast"), hofRoll.as("ref"))
          .collect()
        rows.foreach { r =>
          assert(!r.isNullAt(1) && !r.isNullAt(2), s"mode=$mode unexpected null: $r")
          assert(r.getLong(1) == r.getLong(2), s"mode=$mode '${r.getString(0)}': $r")
        }
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null text yields null; empty is 0; SQL registration works; type check rejects non-strings") {
    import spark.implicits._
    val df = Seq(Some("abc"), None, Some("")).toDF("text")
    val rows = df.select(RollHash.rollHash($"text")).collect()
    assert(!rows(0).isNullAt(0) && rows(0).getLong(0) == 97L + 2 * 98 + 3 * 99)
    assert(rows(1).isNullAt(0))
    assert(!rows(2).isNullAt(0) && rows(2).getLong(0) == 0L)
    df.createOrReplaceTempView("srh_t")
    val viaSql = spark.sql("SELECT string_roll_hash(text) FROM srh_t WHERE text IS NOT NULL").head()
    assert(viaSql.getLong(0) == 97L + 2 * 98 + 3 * 99)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT string_roll_hash(42)").collect()
    }
    assert(err.getMessage.contains("string"), err.getMessage)
  }
}
