package graft.operators

import org.apache.spark.sql.functions._

/** Multimodal column handling: opaque `binary` payloads + typed metadata,
  * with a decode/feature-extract stage whose *plumbing* (schema, typed
  * Dataset, per-partition batching) is real and whose byte-level decoder is
  * a clearly-marked deterministic STUB (no image/audio libs in this
  * container).
  *
  * The binary payloads are synthesized from `documents.text` (utf-8 bytes)
  * so the DuckDB oracle can verify the Spark-side byte plumbing
  * (octet_length / md5 / hex prefix) exactly.
  *
  * Scale notes: decode runs as `mapPartitions` over the binary column —
  * same batch shape as a Pandas-UDF/mapInPandas pipeline (iterator of
  * batches in, iterator out), one narrow stage, no shuffle; partition
  * sizing is controlled by files.maxPartitionBytes on the scan.
  */
case class MmRow(doc_id: Long, payload: Array[Byte])

object Multimodal extends OpModule {

  /** STUB decoder: stands in for image decode (no codec libs here).
    * Deterministic features from the payload bytes; a real deployment swaps
    * this body for an actual decoder, keeping the signature and plumbing.
    */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val len = bytes.length
    (len % 640, len % 480, 3)
  }

  def queries: Map[String, Q] = Map(
    "mm_binary_features" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("payload", encode(col("text"), "utf-8"))
        .select(col("doc_id"),
          length(col("payload")).as("byte_len"),
          md5(col("payload")).as("payload_md5"),
          lower(hex(substring(col("payload"), 1, 4))).as("head_hex"))
    }),
    // frame sampling: treat the payload as a "video", emit one row per
    // sampled frame (every 64th byte offset) with a per-frame fingerprint
    // — the explode-per-frame plumbing of a real frame-sample stage, with
    // the codec stubbed to a deterministic hash.
    "mm_frame_sample" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("payload", encode(col("text"), "utf-8"))
        .select(col("doc_id"), col("text"),
          // integer div: `/` on columns is double division
          explode(sequence(lit(0L),
            expr("(length(payload) - 1) div 64"))).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          md5(concat(col("text"),
            col("frame_idx").cast("string"))).as("frame_fp"))
    }),
    "mm_decode_features" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("payload", encode(col("text"), "utf-8"))
        .select(col("doc_id"), col("payload"))
        .as[MmRow]
        .mapPartitions { it =>
          it.map { r =>
            val (w, h, c) = decodeImageStub(r.payload)
            (r.doc_id, w, h, c)
          }
        }
        .toDF("doc_id", "width", "height", "channels")
    }),
    // resize stage: aspect-preserving fit of the decoded dims into
    // 224x224 (integer math, so the oracle reproduces it exactly). Same
    // typed mapPartitions plumbing as decode — in a real deployment the
    // body calls the imaging lib; the batch shape, schema, and narrow
    // no-shuffle stage are what carry to 100 TB.
    "mm_resize" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("payload", encode(col("text"), "utf-8"))
        .select(col("doc_id"), col("payload"))
        .as[MmRow]
        .mapPartitions { it =>
          it.map { r =>
            val (w, h, _) = decodeImageStub(r.payload)
            val m = math.max(math.max(w, h), 1)
            (r.doc_id, w, h, w * 224 / m, h * 224 / m)
          }
        }
        .toDF("doc_id", "width", "height", "out_w", "out_h")
    }))

  def oracles: Map[String, String] = Map(
    "mm_binary_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
        |  md5(text) AS payload_md5,
        |  lower(hex(encode(substring(text, 1, 4)))) AS head_hex
        |FROM documents""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, f.frame_idx,
        |  md5(text || CAST(f.frame_idx AS VARCHAR)) AS frame_fp
        |FROM documents,
        |  UNNEST(generate_series(0, (octet_length(encode(text)) - 1) // 64))
        |    AS f(frame_idx)""".stripMargin,
    "mm_decode_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        |  CAST(octet_length(encode(text)) % 480 AS INT) AS height,
        |  3 AS channels
        |FROM documents""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id, width, height,
        |  CAST(width * 224 // m AS INT) AS out_w,
        |  CAST(height * 224 // m AS INT) AS out_h
        |FROM (SELECT doc_id,
        |        CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        |        CAST(octet_length(encode(text)) % 480 AS INT) AS height,
        |        greatest(octet_length(encode(text)) % 640,
        |                 octet_length(encode(text)) % 480, 1) AS m
        |      FROM documents)""".stripMargin)
}
