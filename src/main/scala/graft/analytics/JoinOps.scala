package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables

/** Join operator family (SURVEY.md §2.3 J1–J4): the OBT multi-way
  * broadcast left join with role-playing dims, baseline self-join,
  * 1-row cross join (argmax), and agg-to-dim outer join with
  * percent_rank heat tiers.
  *
  * Reference: nyc_taxi_dbt/models/marts/core/obt_trips.sql:3-28,
  * insight_covid_recovery.sql:4-23, insight_uber_effect.sql:4-26,
  * insight_zone_heatmap.sql:3-41.
  *
  * Scale notes — the dim contract: a side gets an explicit `broadcast()`
  * hint ONLY if its cardinality is bounded by the data model (nation=25,
  * the reference's 4–265-row dims, 1-row argmax/min subqueries). Tables
  * that scale with the fact side (orders/customer/supplier) are joined
  * unhinted: AQE broadcasts them while small and shuffle-joins at scale.
  * The heatmap percent_rank window runs on the *aggregated* relation
  * (≤ hundreds of rows), never on event-scale data — same discipline as
  * the reference.
  */
object JoinOps extends QueryPack {

  private def dsumSql(expr: String): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE)"

  def queries: Map[String, Query] = Map(
    "q08_baseline_join" -> { (s, dir) =>
      import s.implicits._
      // Baseline self-join: monthly volume vs first-year baseline by
      // month-of-year (insight_covid_recovery.sql:4-23, J2/A8).
      val o = Tables.load(s, dir, "orders")
      val monthly = o.groupBy(year($"o_orderdate").as("o_year"), month($"o_orderdate").as("o_month"))
        .agg(count(lit(1)).as("n_orders"))
      // scalar-subquery shape kept fully inside the plan: the 1-row min
      // broadcasts into a join instead of a driver-side .head() action
      // (which would run the aggregation twice and serialize the plan)
      val minYear = monthly.agg(min($"o_year").as("y0"))
      val baseline = monthly.join(broadcast(minYear), $"o_year" === $"y0")
        .select($"o_month", $"n_orders".as("baseline_orders"))
      monthly.join(broadcast(baseline), Seq("o_month"), "left")
        .withColumn("pct_of_baseline", lit(100.0) * $"n_orders" / $"baseline_orders")
        .select("o_year", "o_month", "n_orders", "baseline_orders", "pct_of_baseline")
        .orderBy("o_year", "o_month")
    },

    "q09_peak_cross" -> { (s, dir) =>
      import s.implicits._
      // Top-1 argmax year × cross join (insight_uber_effect.sql:4-26, J3/A9).
      val yearly = Tables.load(s, dir, "orders")
        .groupBy(year($"o_orderdate").as("o_year"))
        .agg(count(lit(1)).as("n_orders"))
      val peak = yearly.orderBy($"n_orders".desc, $"o_year".asc).limit(1)
        .select($"o_year".as("peak_year"), $"n_orders".as("peak_orders"))
      yearly.crossJoin(broadcast(peak))
        .withColumn("pct_of_peak", lit(100.0) * $"n_orders" / $"peak_orders")
        .withColumn("era",
          when($"o_year" < $"peak_year", "pre_peak")
            .when($"o_year" === $"peak_year", "peak")
            .otherwise("post_peak"))
        .orderBy("o_year")
    },

    "q10_zone_heatmap" -> { (s, dir) =>
      import s.implicits._
      // Dim left-joined to two independent aggregates, coalesce-0 fill,
      // percent_rank heat tiers (insight_zone_heatmap.sql:3-41, J4/W6).
      val n = Tables.load(s, dir, "nation")
      val custStats = Tables.load(s, dir, "customer")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
      val suppStats = Tables.load(s, dir, "supplier")
        .groupBy($"s_nationkey").agg(count(lit(1)).as("n_supp"))
      val joined = n
        .join(custStats, $"n_nationkey" === $"c_nationkey", "left")
        .join(suppStats, $"n_nationkey" === $"s_nationkey", "left")
        .select(
          $"n_name",
          coalesce($"n_cust", lit(0L)).as("n_cust"),
          coalesce($"n_supp", lit(0L)).as("n_supp"))
      joined
        .withColumn("cust_pr",
          percent_rank().over(Window.orderBy($"n_cust".desc, $"n_name")))
        .withColumn("heat",
          when($"cust_pr" <= 0.2, "hot")
            .when($"cust_pr" <= 0.5, "warm")
            .otherwise("cold"))
        .orderBy("n_name")
    },

    "q11_obt_join" -> { (s, dir) =>
      import s.implicits._
      // One-big-table with role-playing nation dims (obt_trips.sql:3-28,
      // J1). Broadcast discipline: only the genuinely bounded dimensions
      // (nation — 25 rows, like the reference's 4–265-row dims) get an
      // explicit broadcast hint. orders/customer/supplier SCALE WITH THE
      // FACT table, so their joins are left to the planner — AQE
      // broadcasts them while they're small and shuffle-joins them at
      // scale; a hard broadcast hint would OOM at 100×.
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val su = Tables.load(s, dir, "supplier")
      val n = Tables.load(s, dir, "nation")
      val cn = n.select($"n_nationkey".as("cn_key"), $"n_name".as("cust_nation"))
      val sn = n.select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
      li.join(o, $"l_orderkey" === $"o_orderkey", "left")
        .join(c, $"o_custkey" === $"c_custkey", "left")
        .join(broadcast(cn), $"c_nationkey" === $"cn_key", "left")
        .join(su, $"l_suppkey" === $"s_suppkey", "left")
        .join(broadcast(sn), $"s_nationkey" === $"sn_key", "left")
        .select(
          $"l_orderkey", $"l_linenumber", $"cust_nation", $"supp_nation",
          ($"cust_nation" === $"supp_nation").as("is_domestic"),
          ($"o_orderpriority".isin("1-URGENT", "2-HIGH")).as("is_priority"),
          $"l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    "q12_lag_yoy" -> { (s, dir) =>
      import s.implicits._
      // lag() YoY with nullif guard (agg_yearly.sql:18-25, W1).
      val yearly = Tables.load(s, dir, "orders")
        .groupBy(year($"o_orderdate").as("o_year"))
        .agg(count(lit(1)).as("n_orders"))
      val w = Window.orderBy($"o_year")
      yearly
        .withColumn("prev_orders", lag($"n_orders", 1).over(w))
        .withColumn("yoy_pct",
          when($"prev_orders".isNull || $"prev_orders" === 0, lit(null).cast("double"))
            .otherwise(lit(100.0) * ($"n_orders" - $"prev_orders") / $"prev_orders"))
        .orderBy("o_year")
    },

    "q13_share_shift" -> { (s, dir) =>
      import s.implicits._
      // Year-over-year share drift via lag on a computed pct
      // (insight_payment_shift.sql:7-13, W2/P16).
      val yearly = Tables.load(s, dir, "orders")
        .groupBy(year($"o_orderdate").as("o_year"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when($"o_orderstatus" === "O", 1).otherwise(0)).as("n_open"))
        .withColumn("open_pct", lit(100.0) * $"n_open" / $"n_orders")
      val w = Window.orderBy($"o_year")
      yearly
        .withColumn("prev_pct", lag($"open_pct", 1).over(w))
        .withColumn("pct_point_change", $"open_pct" - $"prev_pct")
        .withColumn("trend",
          when($"prev_pct".isNull, "baseline")
            .when($"open_pct" > $"prev_pct", "rising")
            .when($"open_pct" < $"prev_pct", "falling")
            .otherwise("flat"))
        .orderBy("o_year")
    },

    "q65_asof_join" -> { (s, dir) =>
      import s.implicits._
      // As-of join: each purchase picks up the user's most recent click
      // at-or-before it (the point-in-time enrichment the reference's OBT
      // approximates with exact-key dim joins, obt_trips.sql:3-28).
      // lag_us is an exact integer (µs), so the hash gate needs no float
      // tolerance; the DuckDB oracle is a NATIVE `ASOF LEFT JOIN` — an
      // independent algorithm checking the union+window implementation.
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id", $"value")
      asofJoin(purchases, clicks, Seq("user_id"), "ts")
        .select($"event_id", $"user_id", $"value",
          $"asof_event_id", $"asof_value",
          (unix_micros($"ts".cast("timestamp")) -
            unix_micros($"asof_ts".cast("timestamp"))).as("lag_us"))
        .orderBy("event_id")
    }
  )

  /** Scalable as-of join: for each left row, the latest right row with
    * `right.ord <= left.ord` in the same key group. Implemented with the
    * union + running-last-value trick: tag right rows 0 and left rows 1,
    * union, and take `last(payload, ignoreNulls)` over a running window
    * ordered by (ord, tag) — ONE hash shuffle on the key, one ordered
    * pass, no range-condition join (which Spark would plan as a
    * broadcast-nested-loop: O(|L|·|R|) per key and a driver-sized
    * broadcast at 10^10 rows). At equal ord the right row wins (tag 0
    * sorts first), matching ASOF JOIN's `>=` bound. Right payload columns
    * come back prefixed (`asof_` + name, including `asof_<ord>`).
    *
    * The carry is ONE `last(struct(...), ignoreNulls)` of the whole right
    * row, not a window per column: per-column carries would stitch fields
    * from DIFFERENT right rows whenever the newest right row holds a null
    * in one payload column (an inconsistent-row hazard), and N windows
    * over the same spec cost N buffer passes where one struct costs one.
    */
  def asofJoin(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
      ordCol: String, prefix: String = "asof_"): org.apache.spark.sql.DataFrame = {
    val payload = right.columns.filterNot(keyCols.contains).filterNot(_ == ordCol).toSeq
    val carriedCols = ordCol +: payload
    val rTagged = right.select(
      keyCols.map(col) ++ Seq(col(ordCol), lit(0).as("__tag"),
        struct(carriedCols.map(col): _*).as("__asof")): _*)
    val asofType = rTagged.schema("__asof").dataType
    val leftCols = left.columns.filterNot(keyCols.contains).filterNot(_ == ordCol)
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(col(ordCol), lit(1).as("__tag"),
        lit(null).cast(asofType).as("__asof")) ++
        leftCols.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol), col("__tag"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val carried = lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
    carried.filter(col("__tag") === 1)
      .select(keyCols.map(col) ++ Seq(col(ordCol)) ++ leftCols.map(col) ++
        carriedCols.map(c => col(s"__asof.$c").as(s"$prefix$c")): _*)
  }

  def oracles: Map[String, String] = Map(
    // Independent algorithm on purpose: DuckDB's native ASOF JOIN
    // (binary-search per probe) vs the engine's union+running-window.
    "q65_asof_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.value,
        |  c.event_id AS asof_event_id, c.value AS asof_value,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "q08_baseline_join" ->
      """WITH monthly AS (
        |  SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        |baseline AS (
        |  SELECT o_month, n_orders AS baseline_orders FROM monthly
        |  WHERE o_year = (SELECT min(o_year) FROM monthly))
        |SELECT m.o_year, m.o_month, m.n_orders, b.baseline_orders,
        |  CAST(100 AS DOUBLE) * m.n_orders / b.baseline_orders AS pct_of_baseline
        |FROM monthly m LEFT JOIN baseline b USING (o_month)
        |ORDER BY m.o_year, m.o_month""".stripMargin,

    "q09_peak_cross" ->
      """WITH yearly AS (
        |  SELECT year(o_orderdate) AS o_year, count(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |peak AS (
        |  SELECT o_year AS peak_year, n_orders AS peak_orders FROM yearly
        |  ORDER BY n_orders DESC, o_year ASC LIMIT 1)
        |SELECT y.o_year, y.n_orders, p.peak_year, p.peak_orders,
        |  CAST(100 AS DOUBLE) * y.n_orders / p.peak_orders AS pct_of_peak,
        |  CASE WHEN y.o_year < p.peak_year THEN 'pre_peak'
        |       WHEN y.o_year = p.peak_year THEN 'peak'
        |       ELSE 'post_peak' END AS era
        |FROM yearly y CROSS JOIN peak p ORDER BY y.o_year""".stripMargin,

    "q10_zone_heatmap" ->
      """WITH cust AS (
        |  SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
        |supp AS (
        |  SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1),
        |joined AS (
        |  SELECT n_name, coalesce(c.n_cust, 0) AS n_cust,
        |    coalesce(s.n_supp, 0) AS n_supp
        |  FROM nation n
        |  LEFT JOIN cust c ON n.n_nationkey = c.c_nationkey
        |  LEFT JOIN supp s ON n.n_nationkey = s.s_nationkey),
        |ranked AS (
        |  SELECT n_name, n_cust, n_supp,
        |    percent_rank() OVER (ORDER BY n_cust DESC, n_name) AS cust_pr
        |  FROM joined)
        |SELECT n_name, n_cust, n_supp, cust_pr,
        |  CASE WHEN cust_pr <= 0.2 THEN 'hot'
        |       WHEN cust_pr <= 0.5 THEN 'warm'
        |       ELSE 'cold' END AS heat
        |FROM ranked ORDER BY n_name""".stripMargin,

    "q11_obt_join" ->
      """SELECT l_orderkey, l_linenumber,
        |  cn.n_name AS cust_nation, sn.n_name AS supp_nation,
        |  cn.n_name = sn.n_name AS is_domestic,
        |  o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_priority,
        |  l_extendedprice
        |FROM lineitem
        |LEFT JOIN orders ON l_orderkey = o_orderkey
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation cn ON c_nationkey = cn.n_nationkey
        |LEFT JOIN supplier ON l_suppkey = s_suppkey
        |LEFT JOIN nation sn ON s_nationkey = sn.n_nationkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q12_lag_yoy" ->
      """WITH yearly AS (
        |  SELECT year(o_orderdate) AS o_year, count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT o_year, n_orders,
        |  lag(n_orders) OVER (ORDER BY o_year) AS prev_orders,
        |  CASE WHEN lag(n_orders) OVER (ORDER BY o_year) IS NULL
        |         OR lag(n_orders) OVER (ORDER BY o_year) = 0 THEN NULL
        |       ELSE CAST(100 AS DOUBLE)
        |         * (n_orders - lag(n_orders) OVER (ORDER BY o_year))
        |         / lag(n_orders) OVER (ORDER BY o_year) END AS yoy_pct
        |FROM yearly ORDER BY o_year""".stripMargin,

    "q13_share_shift" ->
      """WITH yearly AS (
        |  SELECT year(o_orderdate) AS o_year, count(*) AS n_orders,
        |    CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open
        |  FROM orders GROUP BY 1),
        |pcts AS (
        |  SELECT o_year, n_orders, n_open,
        |    CAST(100 AS DOUBLE) * n_open / n_orders AS open_pct
        |  FROM yearly),
        |shifted AS (
        |  SELECT o_year, n_orders, n_open, open_pct,
        |    lag(open_pct) OVER (ORDER BY o_year) AS prev_pct
        |  FROM pcts)
        |SELECT o_year, n_orders, n_open, open_pct, prev_pct,
        |  open_pct - prev_pct AS pct_point_change,
        |  CASE WHEN prev_pct IS NULL THEN 'baseline'
        |       WHEN open_pct > prev_pct THEN 'rising'
        |       WHEN open_pct < prev_pct THEN 'falling'
        |       ELSE 'flat' END AS trend
        |FROM shifted ORDER BY o_year""".stripMargin
  )
}
