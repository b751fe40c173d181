package graft.analytics

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.util.Tables

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque `binary` payloads with typed metadata, processed by a
  * per-partition typed decode stage.
  *
  * STUB NOTE: real image/audio decoding libraries are not in this
  * container, so `decodeStub` is a clearly-marked deterministic fake
  * (md5-derived dimensions). Everything around it — the binary column,
  * the Dataset[MediaRow] encoder, the mapPartitions batch shape (one
  * decoder init per partition, the expensive-library pattern), and the
  * feature schema — is the real plumbing a codec would drop into.
  * The fake is arithmetic over md5, so even this stage is DuckDB-
  * verifiable (md5 of UTF-8 text == md5 of the binary payload).
  */
object MediaOps extends QueryPack {

  case class MediaRow(doc_id: Long, media: Array[Byte], media_kind: String)
  case class MediaFeatures(
      doc_id: Long, media_kind: String, n_bytes: Int,
      width: Int, height: Int, fingerprint: String)

  /** Deterministic fake decode: dimensions from the first md5 nibbles —
    * replace with a real codec (??? boundary) when libraries exist.
    */
  private def decodeStub(r: MediaRow, md: MessageDigest): MediaFeatures = {
    md.reset()
    val hex = md.digest(r.media).map(b => f"$b%02x").mkString
    def nib(i: Int): Int = Integer.parseInt(hex.substring(i, i + 1), 16)
    MediaFeatures(
      doc_id = r.doc_id,
      media_kind = r.media_kind,
      n_bytes = r.media.length,
      width = 64 + (nib(0) * 16 + nib(1)) * 4,
      height = 64 + (nib(2) * 16 + nib(3)) * 4,
      fingerprint = hex.substring(0, 12))
  }

  def queries: Map[String, Query] = Map(
    "q41_media_pipeline" -> { (s, dir) =>
      import s.implicits._
      val rows = Tables.load(s, dir, "documents")
        .select(
          $"doc_id",
          encode($"text", "UTF-8").as("media"), // stand-in binary payload
          when($"doc_id" % 3 === 0, "image")
            .when($"doc_id" % 3 === 1, "audio")
            .otherwise("video").as("media_kind"))
        .as[MediaRow]
      rows.mapPartitions { it =>
        // one decoder instance per partition — the real-codec init shape
        val md = MessageDigest.getInstance("MD5")
        it.map(r => decodeStub(r, md))
      }.toDF().orderBy("doc_id")
    }
  )

  def oracles: Map[String, String] = Map(
    "q41_media_pipeline" -> {
      def nib(i: Int) = // 1-based hex char of md5(text) as int
        s"(CASE WHEN ascii(substring(md5(text),$i,1)) >= 97 " +
          s"THEN ascii(substring(md5(text),$i,1)) - 87 " +
          s"ELSE ascii(substring(md5(text),$i,1)) - 48 END)"
      s"""SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image'
         |       WHEN doc_id % 3 = 1 THEN 'audio'
         |       ELSE 'video' END AS media_kind,
         |  CAST(length(text) AS INT) AS n_bytes,
         |  CAST(64 + (${nib(1)} * 16 + ${nib(2)}) * 4 AS INT) AS width,
         |  CAST(64 + (${nib(3)} * 16 + ${nib(4)}) * 4 AS INT) AS height,
         |  substring(md5(text), 1, 12) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin
    }
  )
}
