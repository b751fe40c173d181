package graft.cdc

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** The correctness oracle (BASELINE.json:6): a sequential, single-threaded
  * fold of the change log in global LSN order. Deliberately shares no code
  * with the engine — driver-side mutable map, test scale only.
  */
object FoldOracle {

  /** Final table state after folding `events` (schema = payload columns of
    * the input, in input order).
    */
  def finalState(spark: SparkSession, events: DataFrame): DataFrame = {
    val fields = events.schema.fields.filterNot(f => Model.metaCols.contains(f.name.toLowerCase))
    val payloadIdx = fields.map(f => events.schema.fieldIndex(f.name))
    val opIdx = events.schema.fieldIndex("op")
    val docIdx = events.schema.fieldIndex("doc_id")
    val lsnIdx = events.schema.fieldIndex("lsn")

    val sorted = events.collect().sortBy(_.getLong(lsnIdx))
    val state = mutable.LinkedHashMap.empty[String, Row]
    var lastLsn = Long.MinValue
    sorted.foreach { r =>
      val lsn = r.getLong(lsnIdx)
      if (lsn != lastLsn) { // identical-LSN re-deliveries fold once
        lastLsn = lsn
        val key = r.getString(docIdx)
        r.getString(opIdx) match {
          case Model.OpDelete => state.remove(key)
          case _ => state.put(key, Row.fromSeq(payloadIdx.toSeq.map(r.get)))
        }
      }
    }
    spark.createDataFrame(state.values.toList.asJava, StructType(fields))
  }

  /** Symmetric multiset difference — (onlyInA, onlyInB); (0,0) means the
    * two relations are row-for-row identical including array payloads.
    */
  def diff(a: DataFrame, b: DataFrame): (Long, Long) =
    (a.exceptAll(b).count(), b.exceptAll(a).count())
}
