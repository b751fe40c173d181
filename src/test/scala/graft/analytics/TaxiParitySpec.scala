package graft.analytics

import java.sql.Timestamp
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Operator-parity micro-tests on taxi-shaped fixtures (SURVEY.md §5.2
  * item 6, FIXTURES.md §3): pin the exact semantics the reference relies
  * on — dbt_utils surrogate-key bytes, FILTER-agg ≡ when-agg, Snowflake
  * minute-boundary datediff, dayofweek convention, rule-based scoring as
  * Column exprs vs a literal Scala port of the Python UDF, and the
  * header/quoted zone CSV load.
  */
case class Trip(
    VendorID: Int, pickup: Timestamp, dropoff: Timestamp,
    passenger_count: Int, trip_distance: Double, PULocationID: Int,
    DOLocationID: Int, payment_type: Int, fare_amount: Double,
    tip_amount: Double, total_amount: Double)

class TaxiParitySpec extends SparkSpec {

  import spark.implicits._

  private def trips(n: Int): Seq[Trip] = {
    val rnd = new scala.util.Random(13L)
    (0 until n).map { i =>
      val pu = 1700000000000L + i * 90000L
      val durMin = 1 + rnd.nextInt(90)
      val dist = rnd.nextDouble() * 20
      val fare = 3.0 + dist * 2.5 + rnd.nextDouble()
      Trip(
        Seq(1, 2, 6, 7)(rnd.nextInt(4)),
        new Timestamp(pu), new Timestamp(pu + durMin * 60000L),
        rnd.nextInt(7), dist, 1 + rnd.nextInt(265), 1 + rnd.nextInt(265),
        rnd.nextInt(7), fare, rnd.nextDouble() * 10, fare + 2.0)
    } ++ Seq( // the simulator's four fraud archetypes (send_trips.py:47-65)
      Trip(1, new Timestamp(1700000000000L), new Timestamp(1700000300000L),
        1, 40.0, 10, 20, 1, 30.0, 1.0, 33.0), // impossible speed: 40mi in 5min
      Trip(2, new Timestamp(1700000000000L), new Timestamp(1700003600000L),
        1, 0.5, 10, 20, 1, 200.0, 1.0, 203.0), // fare per mile absurd
      Trip(1, new Timestamp(1700000000000L), new Timestamp(1700001800000L),
        1, 5.0, 10, 20, 1, 20.0, 80.0, 102.0), // tip >> fare
      Trip(2, new Timestamp(1700000000000L), new Timestamp(1700001800000L),
        1, 0.0, 42, 42, 1, 95.0, 0.0, 97.0)) // same-zone, zero-distance, high fare
  }

  test("dbt_utils.generate_surrogate_key: exact md5 of '-'-joined coalesced casts") {
    // stg_trips.sql:4-13 semantics, pinned to a known digest
    val df = Seq((Some(1), Some("2024-01-02"), None: Option[String]))
      .toDF("vendor_id", "d", "flag")
      .select(md5(concat_ws("-",
        coalesce($"vendor_id".cast("string"), lit("")),
        coalesce($"d", lit("")),
        coalesce($"flag", lit("")))).as("k"))
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("1-2024-01-02-".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(df.head().getString(0) == expected)
  }

  test("FILTER-ed aggregate ≡ avg over when(cond) (null-skipping)") {
    val df = trips(500).toDF()
    val viaWhen = df.agg(avg(when($"payment_type" === 1, $"tip_amount"))).head().getDouble(0)
    val viaSql = {
      df.createOrReplaceTempView("trips_parity")
      spark.sql(
        "SELECT avg(tip_amount) FILTER (WHERE payment_type = 1) FROM trips_parity")
        .head().getDouble(0)
    }
    assert(math.abs(viaWhen - viaSql) < 1e-12)
  }

  test("Snowflake datediff('minute') counts minute-boundary crossings") {
    // int_trips_validated.sql:50: 00:00:59 → 00:01:01 is ONE minute in
    // Snowflake (boundary crossing), not zero (elapsed)
    val df = Seq((
      Timestamp.valueOf("2024-01-01 00:00:59"),
      Timestamp.valueOf("2024-01-01 00:01:01"))).toDF("a", "b")
      .select((floor(unix_timestamp($"b") / 60) - floor(unix_timestamp($"a") / 60))
        .as("mins"))
    assert(df.head().getLong(0) == 1L)
  }

  test("dayofweek normalization: Spark 1=Sun..7=Sat vs Snowflake 0=Sun..6=Sat") {
    val df = Seq(java.sql.Date.valueOf("2024-01-07")) // a Sunday
      .toDF("d")
      .select(dayofweek($"d").as("spark_dow"), (dayofweek($"d") - 1).as("sf_dow"))
    val r = df.head()
    assert(r.getInt(0) == 1 && r.getInt(1) == 0)
  }

  test("fraud rules as Column exprs == literal Scala port of the Python UDF") {
    // fraud_detector.py:221-294 structure: additive points, clamped at 100,
    // flag list; thresholds from the code (not the drifted README)
    val df = trips(300).toDF()
      .withColumn("dur_min",
        (unix_millis($"dropoff") - unix_millis($"pickup")).cast("double") / 60000.0)
      .withColumn("speed_mph",
        when($"dur_min" > 0, $"trip_distance" / ($"dur_min" / 60.0)).otherwise(0.0))

    val rules: Seq[(String, org.apache.spark.sql.Column, Int)] = Seq(
      ("impossible_speed", $"speed_mph" > 100.0, 40),
      ("fare_per_mile", $"trip_distance" > 0.1 && $"fare_amount" / $"trip_distance" > 50.0, 30),
      ("tip_exceeds_fare", $"tip_amount" > $"fare_amount" * 2.0, 25),
      ("zero_dist_high_fare",
        $"trip_distance" === 0.0 && $"fare_amount" > 20.0 && $"dur_min" > 10.0, 35))
    val exprScore = least(
      rules.map { case (_, c, p) => when(c, p).otherwise(0) }.reduce(_ + _), lit(100))

    val got = df.select($"pickup", $"trip_distance", $"fare_amount", $"tip_amount",
        $"speed_mph", $"dur_min", exprScore.as("score"))
      .collect()

    def oracle(speed: Double, dist: Double, fare: Double, tip: Double, dur: Double): Int = {
      var s = 0
      if (speed > 100.0) s += 40
      if (dist > 0.1 && fare / dist > 50.0) s += 30
      if (tip > fare * 2.0) s += 25
      if (dist == 0.0 && fare > 20.0 && dur > 10.0) s += 35
      math.min(s, 100)
    }
    got.foreach { r =>
      val want = oracle(r.getDouble(4), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(5))
      assert(r.getInt(6) == want, s"row $r")
    }
    // the injected archetypes must actually score
    assert(got.count(_.getInt(6) >= 25) >= 4)
  }

  test("zone CSV load: header + quoted fields + airport/zone flags (stg_zones)") {
    val csv =
      """LocationID,Borough,Zone,service_zone
        |1,EWR,"Newark Airport",EWR
        |4,Manhattan,"Alphabet City",Yellow Zone
        |132,Queens,"JFK Airport",Airports
        |138,Queens,"LaGuardia Airport",Airports
        |79,Manhattan,"East Village, North",Yellow Zone
        |""".stripMargin
    val p = Files.createTempFile("zones", ".csv")
    Files.write(p, csv.getBytes("UTF-8"))
    val zones = spark.read.option("header", "true")
      .schema("LocationID INT, Borough STRING, Zone STRING, service_zone STRING")
      .csv(p.toString)
      .withColumn("is_airport", $"LocationID".isin(1, 132, 138))
      .withColumn("is_yellow", $"service_zone" === "Yellow Zone")
    assert(zones.count() == 5)
    assert(zones.filter($"is_airport").count() == 3)
    // quoted comma survives
    assert(zones.filter($"Zone" === "East Village, North").count() == 1)
  }
}
