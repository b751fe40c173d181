package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic 32-bit hash used by the dedup/LSH family:
  * value = first 8 hex chars of md5(salt:input), as an unsigned integer.
  * Spark evaluates it with conv(); the DuckDB oracle reconstructs the same
  * value nibble-by-nibble (DuckDB has no hex→int conv), so both engines
  * agree bit-for-bit and every LSH bucket/signature is verifiable.
  */
object XHash {

  /** Spark side: conv(hex, 16, 10) on the md5 prefix. */
  def hash32(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), c)), 1, 8), 16, 10).cast("long")

  /** DuckDB side: same value from an md5-hex column named `m`. */
  def duckHash32FromMd5(m: String): String = {
    val nib = (i: Int) =>
      s"(CASE WHEN ascii(substring($m,$i,1)) >= 97 THEN ascii(substring($m,$i,1)) - 87 " +
        s"ELSE ascii(substring($m,$i,1)) - 48 END)"
    (1 to 8).map(i => s"CAST(${nib(i)} AS BIGINT) * ${1L << (4 * (8 - i))}").mkString("(", " + ", ")")
  }

  /** DuckDB side: full expression over an input expression. */
  def duckHash32(expr: String, salt: String): String =
    duckHash32FromMd5(s"md5('$salt:' || ($expr))")
}
