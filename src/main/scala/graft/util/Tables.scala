package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loader for the driver-provided parquet fixtures
  * (/root/testdata/sf*, see TESTDATA.md). One parquet per table.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
