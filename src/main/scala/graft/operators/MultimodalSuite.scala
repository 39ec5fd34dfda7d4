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

  /** One sampled frame's features. */
  case class FrameFeatures(doc_id: Long, n_frames: Long, n_sampled: Long,
                           first_frame_len: Int, frame_checksum: Long)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_frame_sample" -> { (s, d) =>
      import s.implicits._
      // video-style frame sampling: the payload splits into fixed-size
      // "frames" (64-byte chunks standing in for decoded frames) and
      // every 4th is kept — the batch shape (bytes in, per-frame
      // features out, mapPartitions) is exactly a real frame sampler's.
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")).as("media_type"),
          encode(col("text"), "UTF-8").as("payload"))
        .as[MediaRow]
      media.mapPartitions { rows =>
        rows.map { r =>
          val frames = r.payload.grouped(64).toArray
          val sampled = frames.zipWithIndex.collect { case (f, i) if i % 4 == 0 => f }
          // deterministic stand-in for per-frame feature extraction:
          // sum of sampled frame bytes (unsigned)
          val checksum = sampled.map(_.map(_ & 0xff).sum.toLong).sum
          FrameFeatures(r.doc_id, frames.length.toLong, sampled.length.toLong,
            sampled.headOption.map(_.length).getOrElse(0), checksum)
        }
      }.toDF()
        .orderBy("doc_id")
    },

    "mm_dedup" -> { (s, d) =>
      // exact binary-payload dedup: md5 over the raw bytes — media
      // payloads dedup byte-exact, no text normalization. Same
      // one-shuffle hash-groupBy shape as dedup_exact; the 32-char hash
      // is the only thing shuffled, never the payload.
      DedupSuite.corpusWithDups(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .groupBy(md5(col("payload")).as("payload_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    },

    "mm_phash" -> { (s, d) =>
      import s.implicits._
      // perceptual-hash-style near-dup signature: the payload splits
      // into 16 equal byte blocks; bit b is set when block b's mean byte
      // exceeds the payload's global mean. The comparison is the integer
      // cross-multiply block_sum·n > total·block_count — no division, no
      // floats, overflow-safe to multi-GB payloads. A real pHash swaps
      // the byte means for DCT coefficients at this exact seam (the
      // mapPartitions codec boundary); everything after — the 16-bit
      // signature group-by — shuffles 2 bytes per doc, never payloads.
      val media = DedupSuite.corpusWithDups(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
      val sigs = media.mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val n = payload.length
          val blocks = 16
          val bsize = math.max(1L, (n + blocks - 1L) / blocks)
          val sums = new Array[Long](blocks)
          val cnts = new Array[Long](blocks)
          var i = 0
          while (i < n) {
            val b = math.min((i / bsize).toInt, blocks - 1)
            sums(b) += payload(i) & 0xff; cnts(b) += 1; i += 1
          }
          val total = sums.sum
          var sig = 0L
          var bit = 0
          while (bit < blocks) {
            if (cnts(bit) > 0 && sums(bit) * n > total * cnts(bit)) sig |= (1L << bit)
            bit += 1
          }
          (id, sig)
        }
      }.toDF("doc_id", "phash")
      sigs.groupBy(col("phash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_similar"))
        .filter(col("n_similar") > 1)
        .select("phash", "keep_id", "n_similar")
        .orderBy("keep_id")
    },

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
    "mm_frame_sample" ->
      // ASCII corpus ⇒ byte k of the payload is ascii(char k); frame i
      // (0-based, 64 bytes) is sampled when i % 4 = 0
      """SELECT doc_id,
        |  CAST(CEIL(length(text)/64.0) AS BIGINT) AS n_frames,
        |  CAST(CEIL(CEIL(length(text)/64.0)/4.0) AS BIGINT) AS n_sampled,
        |  CAST(LEAST(64, length(text)) AS INT) AS first_frame_len,
        |  CAST(list_sum(list_transform(range(1, length(text) + 1),
        |    p -> CASE WHEN ((p-1)//64)%4 = 0
        |              THEN ascii(substr(text, CAST(p AS INT), 1)) ELSE 0 END)) AS BIGINT)
        |    AS frame_checksum
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_dedup" ->
      // DuckDB's md5 takes VARCHAR only; it hashes the string's UTF-8
      // bytes, which are exactly the Spark side's payload bytes
      s"""SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies
         |FROM (SELECT doc_id, md5(text) AS h FROM (${DedupSuite.CorpusSql}) c) t
         |GROUP BY h HAVING COUNT(*) > 1
         |ORDER BY keep_id""".stripMargin,

    "mm_phash" ->
      // same 16-block mean-bit signature over ascii(char k) = byte k;
      // the bit test is the identical integer cross-multiply
      s"""WITH c AS (${DedupSuite.CorpusSql}),
         |m AS (
         |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
         |    GREATEST(1, (CAST(length(text) AS BIGINT) + 15) // 16) AS bsize
         |  FROM c),
         |s AS (
         |  SELECT doc_id, n,
         |    list_transform(range(0, 16), blk ->
         |      coalesce(list_sum(list_transform(
         |        range(blk * bsize + 1, LEAST(n, (blk + 1) * bsize) + 1),
         |        p -> ascii(substr(text, CAST(p AS INT), 1)))), 0)) AS bs,
         |    list_transform(range(0, 16), blk ->
         |      GREATEST(0, LEAST(n, (blk + 1) * bsize) - blk * bsize)) AS bc
         |  FROM m),
         |sig AS (
         |  SELECT doc_id,
         |    CAST(list_sum(list_transform(range(0, 16), blk ->
         |      CASE WHEN bc[blk + 1] > 0
         |                AND bs[blk + 1] * n > list_sum(bs) * bc[blk + 1]
         |           THEN (1 << blk) ELSE 0 END)) AS BIGINT) AS phash
         |  FROM s)
         |SELECT phash, MIN(doc_id) AS keep_id, COUNT(*) AS n_similar
         |FROM sig GROUP BY phash HAVING COUNT(*) > 1
         |ORDER BY keep_id""".stripMargin,

    "mm_extract" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  ascii(substr(text, 1, 1)) AS first_byte,
        |  CAST(octet_length(encode(text)) % 7 AS BIGINT) AS fake_label
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
