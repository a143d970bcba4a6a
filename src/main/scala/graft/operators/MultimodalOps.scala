package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables.t

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB — but the Spark-side shape is real:
  * binary column, typed output schema, partition-wise (mapPartitions)
  * batch processing with no driver materialization, which is how a codec
  * UDF runs against 100 TB of media.
  */
object MultimodalOps {

  /** Metadata extraction over the binary payload — pure SQL, oracle-checked. */
  val meta: NamedQuery = NamedQuery("q52_multimodal_meta",
    Some("""SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
           |CAST(octet_length(CAST(text AS BLOB)) % 320 + 32 AS BIGINT) AS fake_width,
           |CAST(octet_length(CAST(text AS BLOB)) % 200 + 32 AS BIGINT) AS fake_height
           |FROM documents""".stripMargin),
    (s, d) => {
      val nb = octet_length(col("text").cast("binary")).cast("bigint")
      t(s, d, "documents").select(
        col("doc_id"), nb.as("n_bytes"),
        (nb % 320 + 32).as("fake_width"),
        (nb % 200 + 32).as("fake_height"))
    })

  /** Partition-wise "decode": binary payload → (doc_id, width, height,
    * mean_luma). STUB decode — a real deployment swaps `decodeStub` for a
    * codec call; everything around it (schema, batching, distribution) is
    * the production shape. No oracle (the stub is engine-defined). */
  val decode: NamedQuery = NamedQuery("q53_multimodal_decode", None,
    (s, d) => {
      val spark = s
      import spark.implicits._
      val payloads = t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
      val targetW = 224 // resize target (vision-model input size)
      payloads.mapPartitions { it =>
        it.map { case (id, bytes) =>
          // STUB: deterministic fake of an image decode. Real impl: hand
          // `bytes` to a codec and emit true dimensions + features.
          val w = bytes.length % 320 + 32
          val h = bytes.length % 200 + 32
          val luma = if (bytes.isEmpty) 0.0
            else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
          // resize stub: aspect-preserving scale to targetW wide — the
          // arithmetic a real resampler applies, minus the pixels
          val scale = targetW.toDouble / w
          val rh = math.max(1, math.round(h * scale).toInt)
          (id, w, h, targetW, rh, math.rint(luma * 100) / 100)
        }
      }.toDF("doc_id", "width", "height", "resized_w", "resized_h", "mean_luma")
    })

  /** Frame sampling: treat the payload as a "video" of fixed-size frames
    * and emit every k-th frame as its own row with a feature stub — the
    * one-to-many partition-wise expansion a video pipeline runs (decode
    * stubbed; schema/batching/distribution real). Output is bounded by
    * maxFrames per document, so row explosion is controlled. */
  val frameSample: NamedQuery = NamedQuery("q54b_multimodal_frames", None,
    (s, d) => {
      val spark = s
      import spark.implicits._
      val frameBytes = 64
      val stride = 4
      val maxFrames = 8
      t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, bytes) =>
          // STUB decode: fixed-size byte windows stand in for frames
          val nFrames = bytes.length / frameBytes
          (0 until nFrames by stride).take(maxFrames).map { f =>
            val frame = bytes.slice(f * frameBytes, (f + 1) * frameBytes)
            val luma = if (frame.isEmpty) 0.0
              else frame.map(b => (b & 0xff).toDouble).sum / frame.length
            (id, f, frame.length, math.rint(luma * 100) / 100)
          }
        }
        .toDF("doc_id", "frame_idx", "frame_bytes", "mean_luma")
    })

  def defs: Seq[NamedQuery] = Seq(meta, decode, frameSample)
}
