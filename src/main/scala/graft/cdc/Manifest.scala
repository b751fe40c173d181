package graft.cdc

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** One immutable data file owned by a snapshot: `bucket` is the
  * hash(doc_id) bucket it stores (bucket pruning on merge), `schemaId`
  * indexes [[Manifest.schemas]] (files written before a schema evolution
  * keep their original physical schema and are conformed on read),
  * min/max LSN support file-skipping.
  */
case class FileEntry(
    path: String,
    bucket: Int,
    schemaId: Int,
    minLsn: Long,
    maxLsn: Long,
    rows: Long,
    kind: String) {
  def isDelta: Boolean = kind == FileEntry.Delta
}

object FileEntry {
  /** Fully reconciled rows (payload + _lsn). */
  val Base = "base"
  /** Merge-on-read delta: raw change rows (payload + _lsn + _op incl.
    * delete tombstones), reconciled at read/compaction.
    */
  val Delta = "delta"
}

/** Per-epoch ingest metrics, committed atomically with the data they
  * describe (fixes the reference's at-least-once Redis INCRBY hazard,
  * SURVEY.md §3.3: replay of an epoch can never double-count because the
  * metric row rides the same fenced snapshot commit).
  */
case class EpochMetrics(
    queryId: String,
    epochId: Long,
    eventsIn: Long,
    belowWatermark: Long,
    collapsedInBatch: Long,
    upserts: Long,
    deletes: Long,
    rowsWritten: Long,
    touchedBuckets: Int)

/** Snapshot manifest — the unit of atomic commit (SURVEY.md §4.3).
  *
  * - `fences`: queryId → highest applied epochId. A re-delivered epoch
  *   (foreachBatch replay after restart) is a no-op → exactly-once.
  * - `watermarks`: source partition (as string key, JSON-friendly) →
  *   highest applied LSN. This is both the per-partition lineage record
  *   (source offset → snapshot) and the broadcast min-LSN dedup filter.
  * - `schemas`: append-only history of table schemas (Spark StructType
  *   JSON); last entry is current. Additive evolution only.
  */
case class Manifest(
    version: Long,
    parentVersion: Long,
    numBuckets: Int,
    schemas: Seq[String],
    files: Seq[FileEntry],
    fences: Map[String, Long],
    watermarks: Map[String, Long],
    metrics: Seq[EpochMetrics]) {
  def currentSchemaJson: String = schemas.last
}

object Manifest {
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def toJson(m: Manifest): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(m)

  def fromJson(s: String): Manifest = {
    import scala.jdk.CollectionConverters._
    val m = mapper.readValue(s, classOf[Manifest])
    // Jackson erases Map value generics (values come back as boxed Integer
    // inside Map[String, Long]) — re-read the long-valued maps from the tree.
    val node = mapper.readTree(s)
    def longMap(field: String): Map[String, Long] = {
      val n = node.get(field)
      if (n == null) Map.empty
      else n.fieldNames().asScala.map(k => k -> n.get(k).asLong()).toMap
    }
    m.copy(
      fences = longMap("fences"), watermarks = longMap("watermarks"),
      files = m.files.map(f => if (f.kind == null) f.copy(kind = FileEntry.Base) else f))
  }
}
