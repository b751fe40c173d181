package graft.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Additive schema evolution (SURVEY.md §4.3 item 4, north_rule: "new
  * columns / widened n_tok"): a `lang` column appears and `n_tok` widens
  * int→long mid-log; old snapshots stay readable, old rows backfill null.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchemas: additive + widening, rejects incompatible") {
    val base = Model.tokenDocSchema
    val evolved = StructType(Seq(
      StructField("doc_id", StringType, nullable = false),
      StructField("tokens", ArrayType(IntegerType, containsNull = false)),
      StructField("n_tok", LongType),
      StructField("source", StringType),
      StructField("lang", StringType)))
    val merged = SnapshotTable.mergeSchemas(base, evolved)
    assert(merged.fieldNames.toSeq == Seq("doc_id", "tokens", "n_tok", "source", "lang"))
    assert(merged("n_tok").dataType == LongType)
    assert(merged("lang").nullable)
    // case-insensitive resolution (MATCH_BY_COLUMN_NAME analog)
    val upper = StructType(Seq(StructField("DOC_ID", StringType)))
    assert(SnapshotTable.mergeSchemas(base, upper).fieldNames.count(_.toLowerCase == "doc_id") == 1)
    intercept[IllegalArgumentException] {
      SnapshotTable.mergeSchemas(base,
        StructType(Seq(StructField("n_tok", StringType))))
    }
  }

  test("mid-log evolution: lang column + widened n_tok, replay equals oracle") {
    val logDir = tmpDir("log"); val tableDir = tmpDir("table"); val ckpt = tmpDir("ckpt")
    val cfg = ChangelogGen.Config(numEvents = 3000, numDocs = 500, numFiles = 6)

    // segment 1: v1 schema
    ChangelogGen.writeLog(spark, cfg, logDir.toString)
    val ing1 = IngestJob.Config(
      logDir = logDir.toString, tableDir = tableDir.toString,
      checkpointDir = ckpt.toString, numBuckets = 8)
    IngestJob.replay(spark, ing1)

    // segment 2: DDL happened upstream — new `lang` column, n_tok is long
    val seg2 = ChangelogGen.events(spark, cfg.copy(seed = 99))
      .withColumn("lsn", col("lsn") + cfg.numEvents) // keep global LSN monotone
      .withColumn("n_tok", col("n_tok").cast("long"))
      .withColumn("lang",
        when(col("op") =!= Model.OpDelete,
          element_at(typedLit(Seq("en", "fr", "de")),
            (pmod(xxhash64(col("doc_id")), lit(3L)) + 1L).cast("int"))))
    ChangelogGen.writeSingleFile(seg2.orderBy("lsn"), logDir, "chunk-99990.parquet")

    val v2Schema = StructType(Model.changeEventSchema.fields.map {
      case f if f.name == "n_tok" => f.copy(dataType = LongType)
      case f => f
    } :+ StructField("lang", StringType, nullable = true))
    IngestJob.replay(spark, ing1.copy(schema = v2Schema))

    val table = new SnapshotTable(tableDir.toString, 8)
    val got = table.read(spark)
    assert(got.schema.fieldNames.toSeq == Seq("doc_id", "tokens", "n_tok", "source", "lang"))
    assert(got.schema("n_tok").dataType == LongType, "n_tok widened")

    // oracle over the full evolved log (v1 events conformed to v2 shape)
    val v1AsV2 = ChangelogGen.events(spark, cfg)
      .withColumn("n_tok", col("n_tok").cast("long"))
      .withColumn("lang", lit(null).cast(StringType))
    val want = FoldOracle.finalState(spark, v1AsV2.unionByName(seg2))
    val (a, b) = FoldOracle.diff(got, want)
    assert(a == 0 && b == 0, s"evolved replay mismatch: +$a -$b")

    // old rows (not touched by segment 2) carry null lang
    assert(got.filter(col("lang").isNull).count() > 0)
  }
}
