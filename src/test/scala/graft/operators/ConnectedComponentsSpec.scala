package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains, cliques, and singleton-free labeling converge to min id") {
    // two chains (worst case for plain propagation: diameter = length),
    // one clique, one isolated pair, disjoint id ranges
    val chainA = (1L until 40L).map(i => (i, i + 1))          // comp 1
    val chainB = (100L until 120L).map(i => (i, i + 1))       // comp 100
    val clique = for (i <- 200L to 205L; j <- (i + 1) to 205L) yield (i, j) // 200
    val pair = Seq((300L, 301L))                              // comp 300
    val edges = (chainA ++ chainB ++ clique ++ pair).toDF("d1", "d2")
    val got = ConnectedComponents.run(edges, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 40 + 21 + 6 + 2)
    assert((1L to 40L).forall(got(_) == 1L))
    assert((100L to 120L).forall(got(_) == 100L))
    assert((200L to 205L).forall(got(_) == 200L))
    assert(got(300L) === 300L && got(301L) === 300L)
  }

  test("edge law: every edge's endpoints share a component; labels are members") {
    val edges = (1 to 300).map { i =>
      (i.toLong % 97, (i.toLong * 31 + 7) % 97)
    }.filter { case (a, b) => a != b }.toDF("d1", "d2")
    val comps = ConnectedComponents.run(edges, "d1", "d2").persist()
    val violations = edges
      .join(comps.withColumnRenamed("id", "d1").withColumnRenamed("component", "c1"), "d1")
      .join(comps.withColumnRenamed("id", "d2").withColumnRenamed("component", "c2"), "d2")
      .filter($"c1" =!= $"c2").count()
    assert(violations === 0L)
    // each component's label is its own min member
    val badLabels = comps.groupBy($"component").agg(min($"id").as("lo"))
      .filter($"component" =!= $"lo").count()
    assert(badLabels === 0L)
    comps.unpersist()
  }

  test("pointer doubling: a 64-node chain converges within the round cap") {
    // plain min-propagation would need 63 rounds; the cap of 12 passes
    // only if the jump actually doubles reach per round (O(log d))
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = ConnectedComponents.run(edges, "d1", "d2", maxRounds = 12)
      .agg(max($"component")).head().getLong(0)
    assert(got === 1L)
  }
}
