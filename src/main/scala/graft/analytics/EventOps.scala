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

  def queries: Map[String, Query] = Map(
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
