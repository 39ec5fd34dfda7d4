package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2 E (multimodal) — plumbing for opaque binary media columns.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB; everything Spark-side is real:
  * a `binary` payload column, typed metadata, per-partition batched
  * processing through `mapPartitions` on a case-class `Dataset` (the
  * Scala analog of Python's `mapInPandas` batches), and a feature schema
  * that downstream operators (ANN over decoded embeddings, dedup over
  * perceptual hashes) can consume.
  *
  * At 100 TB the shape matters: decode is per-row CPU work with no
  * shuffle, so it scales linearly with executors; the expensive stub
  * runs once per row inside a partition iterator, exactly where a real
  * codec (JNI/FFI) would sit.
  */
object MultimodalSuite {

  /** One media record: payload + metadata, as a real binary column. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features. `fake_label`/`first_byte` stand in for decoded
    * content features; byte length and payload hash are real.
    */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           first_byte: Int, fake_label: Long)

  /** STUB decoder — deterministic placeholder for an image/audio codec.
    * A real deployment swaps this body for the FFI call; the signature
    * (bytes in, features out, executed inside mapPartitions) is the
    * production shape.
    */
  private def decodeStub(payload: Array[Byte]): (Int, Long) = {
    val first = if (payload.nonEmpty) payload(0) & 0xff else -1
    (first, payload.length.toLong % 7)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_extract" -> { (s, d) =>
      import s.implicits._
      // text → utf-8 bytes stands in for an image payload; the column IS
      // BinaryType, so the pipeline below is byte-real.
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")).as("media_type"),
          encode(col("text"), "UTF-8").as("payload"))
        .as[MediaRow]
      media.mapPartitions { rows =>
        rows.map { r =>
          val (first, label) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, first, label)
        }
      }.toDF()
        .orderBy("doc_id")
    }
  )

  /** The stub's outputs are byte-arithmetic, so even the mapPartitions
    * path is oracle-checkable in SQL.
    */
  def oracles: Map[String, String] = Map(
    "mm_extract" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  ascii(substr(text, 1, 1)) AS first_byte,
        |  CAST(octet_length(encode(text)) % 7 AS BIGINT) AS fake_label
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
