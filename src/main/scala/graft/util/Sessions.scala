package graft.util

import org.apache.spark.sql.SparkSession

object Sessions {

  /** Local-mode hot-path fix: Spark's file WRITE stages serialize the full
    * Hadoop Configuration into every task closure (FileFormatWriter's
    * WriteJobDescription is not broadcast), and Hadoop's
    * Configuration.readFields gzip-inflates every entry — on JDK 17 each
    * Inflater registers/unregisters a PhantomCleanable under one global
    * lock, so at local[32] the 32 concurrently-deserializing tasks convoy
    * on that lock (observed: 253 task-seconds for an 8-second stage, 27/32
    * threads blocked on the Cleaner lock). Real clusters don't hit this —
    * executors are separate JVMs — but in the local[N] sandbox it inverts
    * scaling. Trimming the ~1000 XML-default entries down to the handful
    * actually needed makes per-task conf deserialization ~free.
    */
  def trimHadoopConf(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val keep = conf.iterator().asScala.map(e => e.getKey -> e.getValue).filter {
      case (k, _) =>
        // keep programmatic overlays Spark injected + filesystem basics;
        // drop the XML defaults (code paths pass explicit defaults)
        k.startsWith("spark.") || k.startsWith("parquet.") ||
          k.startsWith("fs.file.") || k.startsWith("fs.defaultFS") ||
          k.startsWith("io.file.buffer.size") || k.startsWith("mapreduce.output")
    }.toList
    conf.clear()
    keep.foreach { case (k, v) => conf.set(k, v) }
  }
}
