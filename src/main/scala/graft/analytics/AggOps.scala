package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables

/** Aggregation operator family transposed from the reference's dbt marts
  * (SURVEY.md §2.4 A1–A10): grouped hash aggregation, FILTER-ed aggregates,
  * conditional shares, re-aggregation rollups (avg-of-avgs quirk preserved),
  * HAVING + rank, and top-k.
  *
  * Reference: nyc_taxi_dbt/models/marts/aggregations/agg_monthly.sql:3-46,
  * agg_yearly.sql:3-26, insights/insight_tipping_patterns.sql:3-19,
  * insight_route_pricing.sql:3-19, insight_anomaly_breakdown.sql:3-12.
  *
  * Cross-engine determinism: all double-valued sums go through
  * decimal(18,6) (exact, accumulation-order independent) and are cast back
  * to double; ratios are IEEE divisions of exact operands. This is also the
  * at-scale-correct choice: floating-point aggregate results otherwise vary
  * run-to-run with partitioning.
  */
object AggOps extends QueryPack {

  /** Exact sum of a double column: order-independent and identical across
    * engines. Map-side partial aggregation (hash agg) still applies.
    */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")
  private def dsumSql(expr: String): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE)"

  def queries: Map[String, Query] = Map(
    "q01_pricing_rollup" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(to_date($"l_shipdate")).as("n_ship_days"),
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    "q02_filtered_avg" -> { (s, dir) =>
      import s.implicits._
      // FILTER-ed aggregate ≡ avg over when(cond): AVG skips nulls
      // (agg_monthly.sql:16,22-23 equivalence, SURVEY A2).
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          (dsum(when($"l_discount" > 0.05, $"l_extendedprice")) /
            nullif(count(when($"l_discount" > 0.05, lit(1))), lit(0)))
            .as("avg_hi_disc_price"),
          count(when($"l_discount" > 0.05, lit(1))).as("n_hi_disc"))
        .orderBy($"l_returnflag")
    },

    "q03_priority_share" -> { (s, dir) =>
      import s.implicits._
      // Conditional count + percentage share (agg_monthly.sql:26-38, A3).
      Tables.load(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when($"o_orderstatus" === "F", 1).otherwise(0)).as("n_finished"))
        .withColumn("pct_finished", lit(100.0) * $"n_finished" / $"n_orders")
        .orderBy($"o_orderpriority")
    },

    "q04_yearly_rollup" -> { (s, dir) =>
      import s.implicits._
      // Re-aggregation rollup: yearly from monthly, preserving the
      // reference's avg-of-avgs (NOT row-weighted) quirk (agg_yearly.sql:3-16).
      val monthly = Tables.load(s, dir, "orders")
        .groupBy(date_trunc("month", $"o_orderdate").as("m"))
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("rev"))
        .withColumn("avg_price", $"rev" / $"n_orders")
      monthly.groupBy(year($"m").as("o_year"))
        .agg(
          sum($"n_orders").as("total_orders"),
          dsum($"rev").as("total_rev"),
          (dsum($"avg_price") / count(lit(1))).as("avg_of_monthly_avg_price"))
        .orderBy($"o_year")
    },

    "q05_nation_tiers" -> { (s, dir) =>
      import s.implicits._
      // Grouped HAVING + row_number rank + tier CASE on the aggregate
      // (insight_tipping_patterns.sql:3-19, A5/W5).
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val agg = c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("total_bal"))
        .filter($"n_cust" >= 2)
      agg
        .withColumn("bal_rank",
          row_number().over(Window.orderBy($"total_bal".desc, $"n_name")))
        .withColumn("tier",
          when($"bal_rank" <= 3, "platinum")
            .when($"total_bal" >= 10000.0, "gold")
            .otherwise("standard"))
        .orderBy($"bal_rank")
    },

    "q06_topk_routes" -> { (s, dir) =>
      import s.implicits._
      // Route-style concat key, HAVING floor, top-k by avg with rank
      // (insight_route_pricing.sql:3-19, A6).
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      // customer scales with the fact side — no broadcast hint; AQE picks
      // broadcast at small SF and a shuffle join at scale
      val agg = o.join(c, $"o_custkey" === $"c_custkey")
        .withColumn("route", concat($"c_mktsegment", lit(" -> "), $"o_orderpriority"))
        .groupBy($"route")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("rev"))
        .filter($"n_orders" >= 10)
        .withColumn("avg_price", $"rev" / $"n_orders")
      agg
        .withColumn("price_rank",
          row_number().over(Window.orderBy($"avg_price".desc, $"route")))
        .filter($"price_rank" <= 20)
        .orderBy($"price_rank")
    },

    "q07_anomaly_flags" -> { (s, dir) =>
      import s.implicits._
      // Boolean anomaly flags → conditional sums + pct per year
      // (insight_anomaly_breakdown.sql:3-12 / int_trips_validated.sql:72-85).
      Tables.load(s, dir, "lineitem")
        .withColumn("ship_year", year($"l_shipdate"))
        .groupBy($"ship_year")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when($"l_discount" > 0.08, 1).otherwise(0)).as("n_high_disc"),
          sum(when($"l_tax" > 0.06, 1).otherwise(0)).as("n_high_tax"),
          sum(when($"l_returnflag" === "R", 1).otherwise(0)).as("n_returned"),
          sum(when($"l_extendedprice" > 50000.0, 1).otherwise(0)).as("n_pricey"))
        .withColumn("pct_returned", lit(100.0) * $"n_returned" / $"n_rows")
        .orderBy($"ship_year")
    }
  )

  def oracles: Map[String, String] = Map(
    "q01_pricing_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  count(*) AS n_rows,
         |  count(DISTINCT CAST(l_shipdate AS DATE)) AS n_ship_days,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_price,
         |  ${dsumSql("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)")} AS sum_disc_price
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q02_filtered_avg" ->
      s"""SELECT l_returnflag,
         |  ${dsumSql("CASE WHEN l_discount > 0.05 THEN l_extendedprice END")}
         |    / nullif(count(CASE WHEN l_discount > 0.05 THEN 1 END), 0) AS avg_hi_disc_price,
         |  count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_hi_disc
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q03_priority_share" ->
      """SELECT o_orderpriority, n_orders, n_finished,
        |  CAST(100 AS DOUBLE) * n_finished / n_orders AS pct_finished
        |FROM (
        |  SELECT o_orderpriority, count(*) AS n_orders,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished
        |  FROM orders GROUP BY 1)
        |ORDER BY o_orderpriority""".stripMargin,

    "q04_yearly_rollup" ->
      s"""WITH monthly AS (
         |  SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n_orders,
         |    ${dsumSql("o_totalprice")} AS rev
         |  FROM orders GROUP BY 1)
         |SELECT year(m) AS o_year, CAST(sum(n_orders) AS BIGINT) AS total_orders,
         |  ${dsumSql("rev")} AS total_rev,
         |  ${dsumSql("rev / n_orders")} / count(*) AS avg_of_monthly_avg_price
         |FROM monthly GROUP BY 1 ORDER BY 1""".stripMargin,

    "q05_nation_tiers" ->
      s"""WITH agg AS (
         |  SELECT n_name, count(*) AS n_cust, ${dsumSql("c_acctbal")} AS total_bal
         |  FROM customer JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY 1 HAVING count(*) >= 2),
         |ranked AS (
         |  SELECT n_name, n_cust, total_bal,
         |    row_number() OVER (ORDER BY total_bal DESC, n_name) AS bal_rank
         |  FROM agg)
         |SELECT n_name, n_cust, total_bal, bal_rank,
         |  CASE WHEN bal_rank <= 3 THEN 'platinum'
         |       WHEN total_bal >= 10000.0 THEN 'gold'
         |       ELSE 'standard' END AS tier
         |FROM ranked ORDER BY bal_rank""".stripMargin,

    "q06_topk_routes" ->
      s"""WITH agg AS (
         |  SELECT c_mktsegment || ' -> ' || o_orderpriority AS route,
         |    count(*) AS n_orders, ${dsumSql("o_totalprice")} AS rev
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1 HAVING count(*) >= 10),
         |ranked AS (
         |  SELECT route, n_orders, rev, rev / n_orders AS avg_price,
         |    row_number() OVER (ORDER BY rev / n_orders DESC, route) AS price_rank
         |  FROM agg)
         |SELECT route, n_orders, rev, avg_price, price_rank
         |FROM ranked WHERE price_rank <= 20 ORDER BY price_rank""".stripMargin,

    "q07_anomaly_flags" ->
      """SELECT ship_year, n_rows, n_high_disc, n_high_tax, n_returned, n_pricey,
        |  CAST(100 AS DOUBLE) * n_returned / n_rows AS pct_returned
        |FROM (
        |  SELECT year(l_shipdate) AS ship_year, count(*) AS n_rows,
        |    CAST(sum(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_disc,
        |    CAST(sum(CASE WHEN l_tax > 0.06 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_tax,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
        |    CAST(sum(CASE WHEN l_extendedprice > 50000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pricey
        |  FROM lineitem GROUP BY 1)
        |ORDER BY ship_year""".stripMargin
  )
}
