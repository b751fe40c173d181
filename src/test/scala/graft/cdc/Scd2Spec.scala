package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 semantics: versions tile the key's lifetime in log order, deletes
  * close without emitting, duplicate re-deliveries collapse, and the plan
  * pays exactly one hash shuffle (both window passes share the key
  * partitioning).
  */
class Scd2Spec extends SparkSpec {

  private def log = {
    import spark.implicits._
    Seq(
      // a: insert + two updates → three versions, last one current
      ("a", 1L, "I", "a1"), ("a", 3L, "U", "a3"), ("a", 7L, "U", "a7"),
      // b: insert then delete → one closed version, nothing current
      ("b", 2L, "I", "b2"), ("b", 5L, "D", null),
      // c: insert re-delivered verbatim (at-least-once) + update
      ("c", 4L, "I", "c4"), ("c", 4L, "I", "c4"), ("c", 6L, "U", "c6"),
      // d: delete of a key never inserted in this log slice → no rows
      ("d", 9L, "D", null)
    ).toDF("doc_id", "lsn", "op", "payload")
  }

  test("intervals, delete close, duplicate collapse") {
    val out = Scd2.fromChangelog(log, Seq("doc_id"), "lsn")
      .select("doc_id", "valid_from_lsn", "valid_to_lsn", "is_current", "payload")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3), r.getString(4)))
      .toSet
    assert(out === Set(
      ("a", 1L, 3L, false, "a1"),
      ("a", 3L, 7L, false, "a3"),
      ("a", 7L, -1L, true, "a7"),
      ("b", 2L, 5L, false, "b2"),
      ("c", 4L, 6L, false, "c4"),
      ("c", 6L, -1L, true, "c6")))
  }

  test("tiling law: valid_to equals the next version's valid_from; at most one current per key") {
    import spark.implicits._
    val out = Scd2.fromChangelog(log, Seq("doc_id"), "lsn")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"valid_from_lsn")
    val gaps = out
      .withColumn("next_from", lead($"valid_from_lsn", 1).over(w))
      .filter($"next_from".isNotNull && $"valid_to_lsn" =!= $"next_from")
      .count()
    assert(gaps === 0L)
    val multiCurrent = out.filter($"is_current")
      .groupBy($"doc_id").count().filter($"count" > 1).count()
    assert(multiCurrent === 0L)
  }

  test("incremental merge law: epoch-split fold equals the full rebuild") {
    import spark.implicits._
    // deterministic mixed log: 37 keys, 400 events, I/U/D interleaved
    // (including delete-then-reinsert lifecycles across split points)
    val events = (1 to 400).map { i =>
      val op = if (i % 11 == 0) "D" else if (i % 3 == 0) "U" else "I"
      (s"k${i % 37}", i.toLong, op, s"p$i")
    }
    val df = events.toDF("doc_id", "lsn", "op", "payload")
    def canon(d: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = d.columns.sorted
      d.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted.toSeq
    }
    val full = canon(Scd2.fromChangelog(df, Seq("doc_id"), "lsn"))
    for (splits <- Seq(Seq(100L, 250L), Seq(50L, 180L, 320L), Seq(399L))) {
      val bounds = (Seq(0L) ++ splits ++ Seq(Long.MaxValue)).sliding(2).toSeq
      val batches = bounds.map { case Seq(lo, hi) =>
        df.filter($"lsn" > lo && $"lsn" <= hi)
      }
      val inc = batches.tail.foldLeft(
        Scd2.fromChangelog(batches.head, Seq("doc_id"), "lsn"))(
        (p, b) => Scd2.merge(p, b, Seq("doc_id"), "lsn"))
      assert(canon(inc) === full, s"splits $splits diverged from full rebuild")
    }
  }

  test("plan: one hash shuffle — dedup and interval windows share the key partitioning") {
    val df = Scd2.fromChangelog(log, Seq("doc_id"), "lsn")
    df.count()
    val p = df.queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges === 1, s"expected 1 hash exchange, plan:\n$p")
  }

  test("merge plan: the close join broadcasts the touched-key side, never sort-merges the open set") {
    import spark.implicits._
    val prior = Scd2.fromChangelog(log, Seq("doc_id"), "lsn")
    val changes = Seq(("a", 10L, "U", "a10")).toDF("doc_id", "lsn", "op", "payload")
    val merged = Scd2.merge(prior, changes, Seq("doc_id"), "lsn")
    merged.count()
    val p = merged.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"close join not broadcast:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"),
      s"open set sort-merged against the per-epoch key set:\n${p.take(1500)}")
  }

  test("foldEpochs: 50-epoch fold with lineage truncation equals the one-shot rebuild") {
    import spark.implicits._
    val events = (0 until 500).map { i =>
      val op = if (i % 19 == 0) "D" else if (i % 3 == 0) "U" else "I"
      (s"k${i % 13}", i.toLong, op, s"p$i")
    }
    val full = events.toDF("doc_id", "lsn", "op", "payload")
    // 50 strictly-increasing lsn ranges — without localCheckpoint this
    // fold stacks 50 unions+joins into one logical plan (the analysis-time
    // blowup a long-lived incremental maintainer would hit)
    val epochs = (0 until 50).map(e =>
      full.filter($"lsn" >= e * 10 && $"lsn" < (e + 1) * 10))
    val folded = Scd2.foldEpochs(epochs, Seq("doc_id"), "lsn", checkpointEvery = 8)
    def canon(d: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = d.columns.sorted
      d.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted.toSeq
    }
    assert(canon(folded) === canon(Scd2.fromChangelog(full, Seq("doc_id"), "lsn")))
  }
}
