package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables

/** Event-stream operator family (SURVEY.md §2.4 A11–A16, §2.10): the
  * reference's fraud-scoring Python UDF re-expressed as pure codegen'd
  * Column expressions, validation/quarantine split, leaderboards,
  * day-of-week × hour matrix, recency ring buffer, and sessionization.
  *
  * Reference: streaming/spark/fraud_detector.py:221-294 (UDF rules),
  * 54-181 (Redis aggregates); streaming/api/schemas.py:8-34 (validation).
  *
  * The reference pays a per-row Python-worker hop for its UDF
  * (fraud_detector.py:296-304); every rule here is a when() expression
  * inside whole-stage codegen — no serialization wall, and Catalyst can
  * prune and push down around it.
  */
object EventOps extends QueryPack {

  /** Additive rule score + flag list, the calculate_fraud_udf shape:
    * struct(score int clamped at 100, flags array<string>)
    * (fraud_detector.py:221-294). Rules are arbitrary-but-deterministic
    * analogs on the events table.
    */
  private def ruleCols: Seq[(String, Column, Int)] = Seq(
    ("high_value", col("value") > 300.0, 40),
    ("night_purchase", col("event_type") === "purchase" && hour(col("ts")) < 6, 25),
    ("error_burst", col("event_type") === "error" && col("value") > 200.0, 30),
    ("round_amount", col("value") === floor(col("value")), 10),
    ("weekend_signup", col("event_type") === "signup" && dayofweek(col("ts")).isin(1, 7), 15))

  /** The FULL 15-rule fraud table (fraud_detector.py:221-294, thresholds
    * from CODE, not the drifted README — SURVEY §2.10): every rule's
    * Spark condition and its DuckDB SQL live side by side so the two
    * engines cannot drift. Inputs are deterministic trip-shaped analogs
    * derived from the events table (same roles: distance, fare, tip,
    * passengers, payment type, locations, ratecode, airport fee,
    * duration, speed, night flag).
    */
  private case class FraudRule(flag: String, pts: Int, spark: Column, duck: String)

  private def fraudRules: Seq[FraudRule] = Seq(
    FraudRule("impossible_speed", 30,
      col("speed_mph") > 100.0, "speed_mph > 100.0"),
    FraudRule("stationary_trip", 25,
      col("speed_mph") < 2.0 && col("duration_min") > 10.0,
      "speed_mph < 2.0 AND duration_min > 10.0"),
    FraudRule("zero_distance_with_fare", 20,
      col("trip_distance") === 0.0 && col("fare_amount") > 0.0,
      "trip_distance = 0.0 AND fare_amount > 0.0"),
    FraudRule("fare_too_high", 20,
      col("fare_per_mile") > 10.5, "fare_per_mile > 10.5"),
    FraudRule("negative_fare", 15,
      col("fare_amount") < 0.0, "fare_amount < 0.0"),
    FraudRule("tip_exceeds_fare", 25,
      col("payment_type") === 1 && col("tip_amount") > col("fare_amount"),
      "payment_type = 1 AND tip_amount > fare_amount"),
    FraudRule("excessive_tip", 15,
      col("payment_type") === 1 && col("tip_pct") > 50.0,
      "payment_type = 1 AND tip_pct > 50.0"),
    FraudRule("same_location_high_fare", 25,
      col("pu_id") === col("do_id") && col("fare_amount") > 5.0,
      "pu_id = do_id AND fare_amount > 5.0"),
    FraudRule("fake_airport_fee", 20,
      col("airport_fee") > 0.0 && !col("pu_id").isin(132, 138),
      "airport_fee > 0.0 AND pu_id NOT IN (132, 138)"),
    FraudRule("too_many_passengers", 15,
      col("passenger_count") > 6, "passenger_count > 6"),
    FraudRule("zero_passengers", 10,
      col("passenger_count") === 0 && col("fare_amount") > 0.0,
      "passenger_count = 0 AND fare_amount > 0.0"),
    FraudRule("night_cash_trip", 10,
      col("is_night") && col("payment_type") === 2,
      "is_night AND payment_type = 2"),
    FraudRule("night_high_tip", 10,
      col("is_night") && col("tip_pct") > 30.0,
      "is_night AND tip_pct > 30.0"),
    FraudRule("fake_jfk_rate", 20,
      col("ratecode_id") === 2 && col("pu_id") =!= 132 && col("do_id") =!= 132,
      "ratecode_id = 2 AND pu_id <> 132 AND do_id <> 132"),
    FraudRule("voided_trip", 20,
      col("payment_type") === 6, "payment_type = 6"),
    FraudRule("disputed_trip", 10,
      col("payment_type") === 4, "payment_type = 4"))

  def queries: Map[String, Query] = Map(
    "q29_fraud_full" -> { (s, dir) =>
      import s.implicits._
      // derived trip-shaped inputs (deterministic arithmetic on events
      // columns, identical in the oracle), then the 15 additive rules +
      // the unflagged is_night +5 base, clamped at 100 — the exact
      // calculate_fraud_udf contract, as codegen'd Column exprs (no UDF)
      val e = Tables.load(s, dir, "events")
        .withColumn("trip_distance", ($"event_id" % 50).cast("double") / 10.0)
        .withColumn("fare_amount", $"value" - 10.0)
        .withColumn("tip_amount", ($"user_id" % 20).cast("double"))
        .withColumn("passenger_count", ($"user_id" % 8).cast("int"))
        .withColumn("payment_type", ($"event_id" % 7).cast("int"))
        .withColumn("pu_id", ($"user_id" % 265 + 1).cast("int"))
        .withColumn("do_id", (($"user_id" + $"event_id") % 265 + 1).cast("int"))
        .withColumn("ratecode_id", ($"event_id" % 6 + 1).cast("int"))
        .withColumn("airport_fee", when($"event_id" % 10 === 0, 1.25).otherwise(0.0))
        .withColumn("duration_min", ($"event_id" % 90).cast("double"))
        .withColumn("is_night", hour($"ts") < 6)
        .withColumn("speed_mph",
          when($"duration_min" > 0.0, $"trip_distance" / ($"duration_min" / 60.0))
            .otherwise(0.0))
        .withColumn("fare_per_mile",
          when($"trip_distance" > 0.0, $"fare_amount" / $"trip_distance").otherwise(0.0))
        .withColumn("tip_pct",
          when($"fare_amount" > 0.0, $"tip_amount" / $"fare_amount" * 100.0)
            .otherwise(0.0))
      val score = least(
        fraudRules.map(r => when(r.spark, r.pts).otherwise(0)).reduce(_ + _)
          + when($"is_night", 5).otherwise(0),
        lit(100)).as("fraud_score")
      val flags = concat_ws(",", fraudRules.map(r => when(r.spark, r.flag)): _*)
        .as("fraud_flags")
      e.select($"event_id", score, flags)
        .filter($"fraud_score" >= 30)
        .orderBy("event_id")
    },

    "q46_json_decode" -> { (s, dir) =>
      import s.implicits._
      // S6: JSON decode with an explicit schema (from_json → data.*
      // flatten, fraud_detector.py:201-204) + the ON_ERROR='CONTINUE'
      // tolerance: every 97th payload is corrupted, parses to null, and
      // is counted — never dropped silently, never poisons the batch.
      val raw = Tables.load(s, dir, "events")
        .withColumn("j", when($"event_id" % 97 === 0,
          concat(lit("not_json:"), $"props")).otherwise($"props"))
      val flat = raw
        .withColumn("data", from_json($"j", "k INT", Map.empty[String, String]))
        .select($"event_id", $"event_type", $"data.*")
      flat.groupBy($"event_type")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when($"k".isNotNull, 1L).otherwise(0L)).as("n_parsed"),
          sum(when($"k".isNull, 1L).otherwise(0L)).as("n_malformed"),
          sum($"k").as("sum_k"))
        .orderBy("event_type")
    },

    "q21_rule_score" -> { (s, dir) =>
      import s.implicits._
      val score = least(
        ruleCols.map { case (_, cond, pts) => when(cond, pts).otherwise(0) }
          .reduce(_ + _), lit(100)).as("risk_score")
      val flags = concat_ws(",",
        ruleCols.map { case (name, cond, _) => when(cond, name) }: _*).as("flags")
      Tables.load(s, dir, "events")
        .select($"event_id", $"event_type", $"value", score, flags)
        .filter($"risk_score" >= 25)
        .orderBy("event_id")
    },

    "q22_validation_split" -> { (s, dir) =>
      import s.implicits._
      // ON_ERROR=CONTINUE / pydantic-bounds analog: classify rows into
      // valid vs quarantine and account for both (P14/S3).
      val valid = $"value".isNotNull && $"value" > 0.0 && $"value" <= 400.0 &&
        $"user_id".between(1, 1000000000L) &&
        $"event_type".isin("view", "click", "purchase", "signup", "error")
      Tables.load(s, dir, "events")
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n_total"),
          sum(when(valid, 1).otherwise(0)).as("n_valid"),
          sum(when(!valid, 1).otherwise(0)).as("n_quarantined"))
        .orderBy("event_type")
    },

    "q23_dow_hour_matrix" -> { (s, dir) =>
      import s.implicits._
      // weekday × 24h activity matrix (redis_client.py:115-138, A15),
      // long format; dow normalized 0=Sun.
      Tables.load(s, dir, "events")
        .groupBy((dayofweek($"ts") - 1).as("dow_sun0"), hour($"ts").as("h"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy("dow_sun0", "h")
    },

    "q62_dow_hour_pivot" -> { (s, dir) =>
      import s.implicits._
      // A15's actual WIDE shape: the reference materializes a 7×24
      // matrix, one row per weekday with a column per hour
      // (redis_client.py:115-138); q23 keeps the long form. Deliberately
      // conditional aggregation (count-FILTER per hour), NOT
      // Dataset.pivot: Catalyst rewrites Pivot — even with an explicit
      // value list — into TWO stacked aggregates (groupBy(dow, hour)
      // then PivotFirst over dow), i.e. two shuffles. The 24 fixed
      // conditional counts express the same matrix in ONE map-side-
      // combinable hash aggregation, so the wide shape costs exactly the
      // long q23's single shuffle at any scale. Empty cells are 0
      // (count of an empty set), matching the reference's zeroed matrix.
      val aggs = (0 until 24).map(h =>
        count(when(hour($"ts") === h, 1)).as(s"h$h"))
      Tables.load(s, dir, "events")
        .groupBy((dayofweek($"ts") - 1).as("dow_sun0"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy("dow_sun0")
    },

    "q24_ring_buffer" -> { (s, dir) =>
      import s.implicits._
      // latest-100 retention (LPUSH+LTRIM analog, fraud_detector.py:74-78,
      // A16) — TakeOrderedAndProject, no full sort at scale.
      Tables.load(s, dir, "events")
        .orderBy($"ts".desc, $"event_id".asc)
        .limit(100)
        .select($"event_id", $"ts", $"event_type", $"value")
    },

    "q25_leaderboard" -> { (s, dir) =>
      import s.implicits._
      // top-k sorted-set leaderboard (ZREVRANGE analog,
      // redis_client.py:44-58, A14).
      Tables.load(s, dir, "events")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"))
        .orderBy($"n_events".desc, $"user_id".asc)
        .limit(10)
    },

    "q26_sessionize" -> { (s, dir) =>
      import s.implicits._
      // gap-based sessionization (30-min inactivity): the batch-side
      // equivalent of the streaming state op; window is PARTITIONED by
      // user (event-scale-safe, unlike an unpartitioned window).
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.load(s, dir, "events")
        .withColumn("prev_ts", lag($"ts", 1).over(w))
        .withColumn("is_new_session",
          when($"prev_ts".isNull ||
            (unix_micros($"ts".cast("timestamp")) - unix_micros($"prev_ts".cast("timestamp"))) > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_seq",
          sum($"is_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id")
        .agg(
          max($"session_seq").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }
  )

  def oracles: Map[String, String] = Map(
    "q29_fraud_full" -> {
      val scoreSql = fraudRules
        .map(r => s"CASE WHEN ${r.duck} THEN ${r.pts} ELSE 0 END")
        .mkString("\n      + ") + "\n      + CASE WHEN is_night THEN 5 ELSE 0 END"
      val flagsSql = fraudRules
        .map(r => s"CASE WHEN ${r.duck} THEN '${r.flag}' END")
        .mkString(",\n      ")
      s"""WITH d AS (
         |  SELECT event_id,
         |    CAST(event_id % 50 AS DOUBLE) / 10.0 AS trip_distance,
         |    value - 10.0 AS fare_amount,
         |    CAST(user_id % 20 AS DOUBLE) AS tip_amount,
         |    CAST(user_id % 8 AS INT) AS passenger_count,
         |    CAST(event_id % 7 AS INT) AS payment_type,
         |    CAST(user_id % 265 + 1 AS INT) AS pu_id,
         |    CAST((user_id + event_id) % 265 + 1 AS INT) AS do_id,
         |    CAST(event_id % 6 + 1 AS INT) AS ratecode_id,
         |    CASE WHEN event_id % 10 = 0 THEN 1.25 ELSE 0.0 END AS airport_fee,
         |    CAST(event_id % 90 AS DOUBLE) AS duration_min,
         |    hour(ts) < 6 AS is_night
         |  FROM events),
         |d2 AS (
         |  SELECT *,
         |    CASE WHEN duration_min > 0.0 THEN trip_distance / (duration_min / 60.0)
         |         ELSE 0.0 END AS speed_mph,
         |    CASE WHEN trip_distance > 0.0 THEN fare_amount / trip_distance
         |         ELSE 0.0 END AS fare_per_mile,
         |    CASE WHEN fare_amount > 0.0 THEN tip_amount / fare_amount * 100.0
         |         ELSE 0.0 END AS tip_pct
         |  FROM d),
         |scored AS (
         |  SELECT event_id,
         |    least($scoreSql, 100) AS fraud_score,
         |    concat_ws(',',
         |      $flagsSql) AS fraud_flags
         |  FROM d2)
         |SELECT event_id, fraud_score, fraud_flags FROM scored
         |WHERE fraud_score >= 30 ORDER BY event_id""".stripMargin
    },

    "q46_json_decode" ->
      """SELECT event_type, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
        |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_malformed,
        |  CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (
        |  SELECT event_type,
        |    CASE WHEN json_valid(j) THEN CAST(json_extract_string(j, '$.k') AS INT) END AS k
        |  FROM (
        |    SELECT event_type,
        |      CASE WHEN event_id % 97 = 0 THEN 'not_json:' || props ELSE props END AS j
        |    FROM events))
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q21_rule_score" ->
      """SELECT event_id, event_type, value, risk_score, flags FROM (
        |  SELECT event_id, event_type, value,
        |    least(
        |      CASE WHEN value > 300.0 THEN 40 ELSE 0 END
        |      + CASE WHEN event_type = 'purchase' AND hour(ts) < 6 THEN 25 ELSE 0 END
        |      + CASE WHEN event_type = 'error' AND value > 200.0 THEN 30 ELSE 0 END
        |      + CASE WHEN value = floor(value) THEN 10 ELSE 0 END
        |      + CASE WHEN event_type = 'signup' AND dayofweek(ts) IN (0, 6) THEN 15 ELSE 0 END,
        |      100) AS risk_score,
        |    concat_ws(',',
        |      CASE WHEN value > 300.0 THEN 'high_value' END,
        |      CASE WHEN event_type = 'purchase' AND hour(ts) < 6 THEN 'night_purchase' END,
        |      CASE WHEN event_type = 'error' AND value > 200.0 THEN 'error_burst' END,
        |      CASE WHEN value = floor(value) THEN 'round_amount' END,
        |      CASE WHEN event_type = 'signup' AND dayofweek(ts) IN (0, 6) THEN 'weekend_signup' END
        |    ) AS flags
        |  FROM events)
        |WHERE risk_score >= 25 ORDER BY event_id""".stripMargin,

    "q22_validation_split" ->
      """SELECT event_type, count(*) AS n_total,
        |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        |  CAST(sum(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined
        |FROM (
        |  SELECT event_type,
        |    value IS NOT NULL AND value > 0.0 AND value <= 400.0
        |      AND user_id BETWEEN 1 AND 1000000000
        |      AND event_type IN ('view','click','purchase','signup','error') AS ok
        |  FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q23_dow_hour_matrix" ->
      """SELECT dayofweek(ts) AS dow_sun0, hour(ts) AS h, count(*) AS n_events
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q62_dow_hour_pivot" -> {
      val cells = (0 until 24)
        .map(h => s"count(*) FILTER (WHERE hour(ts) = $h) AS h$h")
        .mkString(", ")
      s"SELECT dayofweek(ts) AS dow_sun0, $cells FROM events GROUP BY 1 ORDER BY 1"
    },

    "q24_ring_buffer" ->
      """SELECT event_id, ts, event_type, value FROM events
        |ORDER BY ts DESC, event_id ASC LIMIT 100""".stripMargin,

    "q25_leaderboard" ->
      """SELECT user_id, count(*) AS n_events FROM events
        |GROUP BY 1 ORDER BY n_events DESC, user_id ASC LIMIT 10""".stripMargin,

    "q26_sessionize" ->
      """WITH gaps AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000 THEN 1
        |         ELSE 0 END AS is_new_session
        |  FROM gaps)
        |SELECT user_id, CAST(sum(is_new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM flagged GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
