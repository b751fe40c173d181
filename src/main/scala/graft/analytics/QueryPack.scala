package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of queries plus (optionally) a DuckDB-executable ANSI-SQL
  * oracle per query. The driver's correctness gate (Verify → DuckDB compare)
  * requires column names to match exactly between the Spark result and the
  * oracle result, and values to hash identically — so query authors here must:
  *   - alias every computed column identically on both sides;
  *   - never emit raw `sum(double)`/`avg(double)` (accumulation-order
  *     dependent): sum through `decimal` and cast the exact result to double;
  *   - give every `ORDER BY`/window a full deterministic tie-break.
  */
trait QueryPack {
  type Query = (SparkSession, String) => DataFrame
  def queries: Map[String, Query]
  def oracles: Map[String, String]
}
