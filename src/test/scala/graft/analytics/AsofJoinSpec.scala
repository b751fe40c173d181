package graft.analytics

import graft.SparkSpec

/** As-of join semantics (union + running-window implementation): latest
  * right row at-or-before each left row per key, equal-ord right rows
  * visible, keys with no prior right row yield nulls — and the plan
  * contains no join operator at all (the degenerate formulation is a
  * range-condition BroadcastNestedLoopJoin, O(|L|·|R|) per key).
  */
class AsofJoinSpec extends SparkSpec {

  test("at-or-before match, equal-ord visibility, and null when no prior right row") {
    import spark.implicits._
    val left = Seq(("u1", 10L, "l-a"), ("u1", 20L, "l-b"), ("u2", 5L, "l-c"))
      .toDF("user_id", "ts", "tag_l")
    val right = Seq(("u1", 10L, "r-ten"), ("u1", 15L, "r-fifteen"), ("u3", 1L, "r-other"))
      .toDF("user_id", "ts", "r_payload")
    val out = JoinOps.asofJoin(left, right, Seq("user_id"), "ts")
      .select("user_id", "ts", "tag_l", "asof_ts", "asof_r_payload")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getString(4)))
      .toSet
    assert(out === Set(
      ("u1", 10L, "l-a", 10L, "r-ten"), // equal ord: right row visible
      ("u1", 20L, "l-b", 15L, "r-fifteen"), // strictly-later right ignored
      ("u2", 5L, "l-c", -1L, null))) // no right row for the key
  }

  test("plan: no join operator, no cartesian — one key shuffle for the running window") {
    import spark.implicits._
    val left = Seq(("u1", 10L, 1.0)).toDF("user_id", "ts", "v")
    val right = Seq(("u1", 5L, 2.0)).toDF("user_id", "ts", "w")
    val df = JoinOps.asofJoin(left, right, Seq("user_id"), "ts")
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges === 1, s"expected 1 hash exchange, plan:\n$p")
  }
}
