package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables

/** Similarity search over the `embeddings` table (`Array[Float]` column):
  * brute-force cosine top-k as the exact baseline, and BOTH
  * industry-standard scale paths — multi-table random-hyperplane LSH
  * (q39, candidates only within a bucket) and IVF coarse quantization
  * (q44, candidates only within probed centroid cells).
  *
  * Determinism across engines: embeddings are quantized to integers
  * (round(x*1000)) so dot products and norms are exact int64 arithmetic;
  * cosine = dot/√n1/√n2 is then IEEE-identical in Spark and DuckDB, and
  * top-k has a full tie-break. Float-sum ordering differences can never
  * flip a rank.
  *
  * Scale shape: the brute-force variant broadcasts the (small) query set —
  * a broadcast nested-loop by construction, O(Q×N) compute with no
  * shuffle of the big side; the LSH variant replaces it with an equi-join
  * on bucket id (shuffle-partitionable, O(collisions) compute).
  */
object AnnOps extends QueryPack {

  private val Dim = 64
  private val NPlanes = 12

  /** Quantized embedding (Spark). */
  private[analytics] def qe(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1000, 0).cast("long"))

  private[analytics] val duckQe =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))"

  /** Exact int64 dot product — a custom codegen'd Catalyst expression
    * ([[graft.functions.LongArrayDot]]); the HOF chain
    * `aggregate(zip_with(...))` it replaces is CodegenFallback and
    * allocated an intermediate array per pair, breaking whole-stage
    * codegen at the hottest operator of every ANN query.
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.ArrayDot.dotLong(a, b)

  /** Multi-table hyperplane LSH for q39: `NTables` independent tables of
    * `NPlanes` planes each → 2^12 = 4096 buckets per table. Expected
    * bucket occupancy for near-uniform embeddings is n/4096 per table
    * (~0.5 at n=2000, measured 892–918 occupied buckets with max
    * occupancy ≤ 45 at sf0.1), so per-bucket candidate sets stay bounded
    * as the corpus grows — raise NPlanes with log2(n) at scale. Recall
    * comes from the TABLE union (a pair colliding in any table is a
    * candidate), the standard LSH OR-of-ANDs construction.
    *
    * Plane family: w_{t,j}[i] = ((i*A_t + j) % 13) - 6, i 1-based, with
    * A_t ∈ {2,3,5,7}. Only residues mod 13 matter, so distinct A_t give
    * distinct residue sequences and j=0..11 distinct offsets — all 48
    * planes are pairwise distinct (verified), and the arithmetic is
    * engine-exact in both Spark and DuckDB.
    */
  private[analytics] val NTables = 4
  private val TableA = Seq(2, 3, 5, 7)

  private def plane(t: Int, j: Int): Seq[Long] =
    (1 to Dim).map(i => (((i * TableA(t) + j) % 13) - 6).toLong)

  private[analytics] def bucketCol(q: Column, t: Int): Column =
    (0 until NPlanes).map { j =>
      when(dot(q, typedLit(plane(t, j))) >= 0, 1L << j).otherwise(0L)
    }.reduce(_ + _)

  private[analytics] def duckBucket(t: Int): String =
    (0 until NPlanes).map { j =>
      s"""(CASE WHEN CAST(list_sum(list_transform(generate_series(1, $Dim),
         |    i -> qe[i] * ((i*${TableA(t)} + $j) % 13 - 6))) AS BIGINT) >= 0
         |  THEN ${1L << j} ELSE 0 END)""".stripMargin
    }.mkString(" + ")

  private def quantized(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "embeddings")
      .select($"vec_id", $"label", qe($"embedding").as("qe"))
      .withColumn("norm2", dot($"qe", $"qe"))
  }

  private val duckQuantized =
    s"""q0 AS (SELECT vec_id, label, $duckQe AS qe FROM embeddings),
       |qn AS (SELECT vec_id, label, qe,
       |  CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS norm2 FROM q0)""".stripMargin

  private val duckDot =
    "CAST(list_sum(list_transform(generate_series(1, 64), i -> q_qe[i] * qe[i])) AS BIGINT)"

  /** q38's broadcast query set is capped at a CONSTANT size by
    * construction (TakeOrderedAndProject over the id filter), so the
    * broadcast side is bounded regardless of corpus growth — asserted in
    * PlanQualitySpec. (The r2 shape, 1% of n, grew with the corpus.)
    */
  private[analytics] val BruteQueryK = 20

  def queries: Map[String, Query] = Map(
    "q38_ann_brute_topk" -> { (s, dir) =>
      import s.implicits._
      val n = quantized(s, dir)
      val q = n.filter($"vec_id" % 100 === 0)
        .orderBy($"vec_id").limit(BruteQueryK)
        .select($"vec_id".as("query_id"), $"qe".as("q_qe"), $"norm2".as("q_n2"))
      val scored = n.join(broadcast(q), $"vec_id" =!= $"query_id")
        .withColumn("dot", dot($"q_qe", $"qe"))
        .withColumn("score",
          $"dot".cast("double") / sqrt($"q_n2".cast("double")) / sqrt($"norm2".cast("double")))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy($"query_id").orderBy($"score".desc, $"vec_id")))
        .filter($"rank" <= 5)
        .select($"query_id", $"vec_id", $"dot", $"score", $"rank")
        .orderBy("query_id", "rank")
    },

    "q39_ann_lsh" -> { (s, dir) =>
      import s.implicits._
      // multi-table hyperplane LSH: a candidate shares a bucket with the
      // query in ANY of the 4 tables (equi-join on (table, bucket) — the
      // 100 TB-shaped plan: shuffle-partitionable, O(collisions) compute,
      // 4096 buckets/table bounds per-bucket work)
      val n = quantized(s, dir)
      val tb = explode(array((0 until NTables).map(t =>
        struct(lit(t).as("t"), bucketCol($"qe", t).as("bucket"))): _*)).as("tb")
      val sigs = n.select($"vec_id", tb)
        .select($"vec_id", $"tb.t".as("t"), $"tb.bucket".as("bucket"))
      val qsigs = sigs.filter($"vec_id" % 100 === 0)
        .select($"vec_id".as("query_id"), $"t", $"bucket")
      val pairs = sigs.join(qsigs, Seq("t", "bucket"))
        .filter($"vec_id" =!= $"query_id")
        .groupBy($"query_id", $"vec_id")
        .agg(count(lit(1)).as("n_shared_tables"))
      val scored = pairs
        .join(n.select($"vec_id", $"qe", $"norm2"), Seq("vec_id"))
        .join(n.filter($"vec_id" % 100 === 0)
          .select($"vec_id".as("query_id"), $"qe".as("q_qe"), $"norm2".as("q_n2")),
          Seq("query_id"))
        .withColumn("score",
          dot($"q_qe", $"qe").cast("double") /
            sqrt($"q_n2".cast("double")) / sqrt($"norm2".cast("double")))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy($"query_id").orderBy($"score".desc, $"vec_id")))
        .filter($"rank" <= 3)
        .select($"query_id", $"vec_id", $"n_shared_tables", $"score", $"rank")
        .orderBy("query_id", "rank")
    },

    "q40_embedding_centroids" -> { (s, dir) =>
      import s.implicits._
      // per-label centroid stats over quantized components (exact ints)
      val n = quantized(s, dir)
      n.groupBy($"label")
        .agg(
          count(lit(1)).as("n_vecs"),
          sum(element_at($"qe", 1)).as("sum_c1"),
          sum(element_at($"qe", 17)).as("sum_c17"),
          sum(element_at($"qe", 33)).as("sum_c33"),
          sum(element_at($"qe", 49)).as("sum_c49"),
          sum($"norm2").as("sum_norm2"))
        .withColumn("avg_c1", $"sum_c1".cast("double") / $"n_vecs")
        .orderBy("label")
    },

    "q44_ann_ivf" -> { (s, dir) =>
      import s.implicits._
      // IVF (inverted-file) ANN — the other industry-standard scale path
      // next to LSH (q39): vectors partition into cells around coarse
      // centroids; a query probes only its 3 nearest cells (multi-probe)
      // and brute-forces within. The codebook is DATA-DRIVEN and grows
      // with the corpus: cells = ⌊√n⌋ deterministic sample medoids
      // (every ⌊n/cells⌋-th vector by id — a seeded systematic sample,
      // the sampled-medoid analog of FAISS's k-means-on-a-sample
      // training). Occupancy math: cells=√n ⇒ expected n/√n = √n
      // vectors/cell, so per-query probe work is O(3·√n·d) and total
      // probe compute O(Q·√n·d) — the per-cell candidate list no longer
      // blows up as O(n/constant) the way a fixed 10-cell codebook did.
      // Every centroid component is the medoid's exact quantized int64,
      // so all dots stay exact integer arithmetic — bit-identical across
      // engines. At 100 TB: the √n codebook is still broadcast-sized
      // (√(10^10 rows) = 10^5 rows × 64 ints ≈ 50 MB; shard the
      // assignment scan if d grows), cell assignment is one scan ×
      // broadcast, and the probe join is an equi-join on cell id —
      // never all-pairs (asserted in PlanQualitySpec).
      val n = quantized(s, dir)
      // bounded driver scalars (one count) size the codebook; the seeds
      // themselves never leave the executors
      val total = n.count()
      val cells = math.max(2L, math.sqrt(total.toDouble).toLong)
      val stride = math.max(1L, total / cells)
      val cent = n
        .filter($"vec_id" % stride === 0 && $"vec_id" < cells * stride)
        .select(($"vec_id" / stride).cast("int").as("cell"),
          $"qe".as("cvec"), $"norm2".as("cnorm2"))
      def cellScored(vecs: DataFrame): DataFrame = vecs
        .crossJoin(broadcast(cent))
        .withColumn("cscore",
          dot($"qe", $"cvec").cast("double") /
            sqrt($"norm2".cast("double")) / sqrt($"cnorm2".cast("double")))
      // assignment = per-vector argmax over cells: a map-side-combinable
      // hash agg (max of an orderable struct; -cell encodes the cell-asc
      // tie-break), NOT a global row_number window — at 100 TB the window
      // is a full sort shuffle of n×cells rows, the argmax agg is a
      // partial-agg of the same rows with √n-sized groups
      val assigned = cellScored(n)
        .groupBy($"vec_id")
        .agg(max(struct($"cscore", (-$"cell").as("negcell"))).as("best"))
        .select($"vec_id", (-$"best.negcell").cast("int").as("cell"))
      // only query vectors need the top-3 multi-probe ranking: filter to
      // the bounded query set BEFORE the window, so the sort is over
      // |Q|×cells rows, not n×cells
      val probes = cellScored(n.filter($"vec_id" % 100 === 0))
        .withColumn("crank", row_number().over(
          Window.partitionBy($"vec_id").orderBy($"cscore".desc, $"cell")))
        .filter($"crank" <= 3)
        .select($"vec_id".as("query_id"), $"cell")
      val pairs = assigned.join(probes, Seq("cell"))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id", $"cell")
      val scored = pairs
        .join(n.select($"vec_id", $"qe", $"norm2"), Seq("vec_id"))
        .join(n.filter($"vec_id" % 100 === 0)
          .select($"vec_id".as("query_id"), $"qe".as("q_qe"), $"norm2".as("q_n2")),
          Seq("query_id"))
        .withColumn("score",
          dot($"q_qe", $"qe").cast("double") /
            sqrt($"q_n2".cast("double")) / sqrt($"norm2".cast("double")))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy($"query_id").orderBy($"score".desc, $"vec_id")))
        .filter($"rank" <= 3)
        .select($"query_id", $"vec_id", $"cell", $"score", $"rank")
        .orderBy("query_id", "rank")
    }
  )

  def oracles: Map[String, String] = Map(
    "q38_ann_brute_topk" ->
      s"""WITH $duckQuantized,
         |q AS (SELECT vec_id AS query_id, qe AS q_qe, norm2 AS q_n2
         |      FROM qn WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT $BruteQueryK),
         |scored AS (
         |  SELECT query_id, vec_id, $duckDot AS dot,
         |    CAST($duckDot AS DOUBLE) / sqrt(CAST(q_n2 AS DOUBLE))
         |      / sqrt(CAST(norm2 AS DOUBLE)) AS score
         |  FROM qn JOIN q ON vec_id <> query_id),
         |ranked AS (
         |  SELECT query_id, vec_id, dot, score,
         |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id, dot, score, rank FROM ranked
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q39_ann_lsh" -> {
      val sigSelects = (0 until NTables).map(t =>
        s"SELECT vec_id, $t AS t, ${duckBucket(t)} AS bucket FROM qn")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH $duckQuantized,
         |sigs AS (
         |  $sigSelects),
         |q AS (SELECT vec_id AS query_id, t, bucket FROM sigs WHERE vec_id % 100 = 0),
         |pairs AS (
         |  SELECT query_id, s.vec_id, CAST(count(*) AS BIGINT) AS n_shared_tables
         |  FROM sigs s JOIN q ON s.t = q.t AND s.bucket = q.bucket
         |    AND s.vec_id <> q.query_id
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT p.query_id, p.vec_id, p.n_shared_tables,
         |    CAST($duckDot AS DOUBLE) / sqrt(CAST(q_n2 AS DOUBLE))
         |      / sqrt(CAST(norm2 AS DOUBLE)) AS score
         |  FROM pairs p
         |  JOIN qn ON p.vec_id = qn.vec_id
         |  JOIN (SELECT vec_id AS qid2, qe AS q_qe, norm2 AS q_n2 FROM qn) qq
         |    ON p.query_id = qq.qid2),
         |ranked AS (
         |  SELECT query_id, vec_id, n_shared_tables, score,
         |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id, n_shared_tables, score, rank FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    },

    "q40_embedding_centroids" ->
      s"""WITH $duckQuantized
         |SELECT label, count(*) AS n_vecs,
         |  CAST(sum(qe[1]) AS BIGINT) AS sum_c1,
         |  CAST(sum(qe[17]) AS BIGINT) AS sum_c17,
         |  CAST(sum(qe[33]) AS BIGINT) AS sum_c33,
         |  CAST(sum(qe[49]) AS BIGINT) AS sum_c49,
         |  CAST(sum(norm2) AS BIGINT) AS sum_norm2,
         |  CAST(CAST(sum(qe[1]) AS BIGINT) AS DOUBLE) / count(*) AS avg_c1
         |FROM qn GROUP BY label ORDER BY label""".stripMargin,

    "q44_ann_ivf" ->
      s"""WITH $duckQuantized,
         |params AS (
         |  SELECT count(*) AS total,
         |    greatest(2, CAST(floor(sqrt(count(*))) AS BIGINT)) AS cells,
         |    greatest(1, count(*) // greatest(2, CAST(floor(sqrt(count(*))) AS BIGINT)))
         |      AS stride
         |  FROM qn),
         |cent2 AS (
         |  SELECT CAST(vec_id // stride AS INT) AS cell, qe AS cvec, norm2 AS cnorm2
         |  FROM qn, params
         |  WHERE vec_id % stride = 0 AND vec_id < cells * stride),
         |cellscore AS (
         |  SELECT n.vec_id, c.cell,
         |    CAST(CAST(list_sum(list_transform(generate_series(1, $Dim),
         |        i -> n.qe[i] * c.cvec[i])) AS BIGINT) AS DOUBLE)
         |      / sqrt(CAST(n.norm2 AS DOUBLE)) / sqrt(CAST(c.cnorm2 AS DOUBLE)) AS cscore
         |  FROM qn n CROSS JOIN cent2 c),
         |ranked_cells AS (
         |  SELECT vec_id, cell,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY cscore DESC, cell) AS crank
         |  FROM cellscore),
         |assigned AS (SELECT vec_id, cell FROM ranked_cells WHERE crank = 1),
         |probes AS (
         |  SELECT vec_id AS query_id, cell FROM ranked_cells
         |  WHERE vec_id % 100 = 0 AND crank <= 3),
         |pairs AS (
         |  SELECT p.query_id, a.vec_id, a.cell
         |  FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.query_id),
         |scored AS (
         |  SELECT pr.query_id, pr.vec_id, pr.cell,
         |    CAST($duckDot AS DOUBLE) / sqrt(CAST(q_n2 AS DOUBLE))
         |      / sqrt(CAST(norm2 AS DOUBLE)) AS score
         |  FROM pairs pr
         |  JOIN qn ON pr.vec_id = qn.vec_id
         |  JOIN (SELECT vec_id AS qid2, qe AS q_qe, norm2 AS q_n2 FROM qn) qq
         |    ON pr.query_id = qq.qid2),
         |final_ranked AS (
         |  SELECT query_id, vec_id, cell, score,
         |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id, cell, score, rank FROM final_ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  )
}
