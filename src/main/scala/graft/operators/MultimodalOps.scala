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
    * resize dims, mean luma). STUB decode — a real deployment swaps the
    * byte arithmetic for a codec call; everything around it (schema,
    * batching, distribution) is the production shape. The stub is
    * deterministic byte arithmetic, so it IS oracle-checkable: DuckDB
    * recomputes the same features from the characters (the ASCII guard
    * keeps byte and character views identical on both engines; luma is
    * exact integer arithmetic — x100 fixed-point, half-up — so no
    * float-rounding dialect can split the hash). */
  val decode: NamedQuery = NamedQuery("q53_multimodal_decode",
    Some("""WITH a AS (SELECT doc_id, text,
           |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n
           |  FROM documents
           |  WHERE octet_length(CAST(text AS BLOB)) = length(text) AND text <> ''),
           |s AS (SELECT doc_id, n,
           |    CAST(list_sum(list_transform(range(1, CAST(n + 1 AS INT)),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))) AS BIGINT) AS sm
           |  FROM a)
           |SELECT doc_id, n % 320 + 32 AS width, n % 200 + 32 AS height,
           |  CAST(224 AS BIGINT) AS resized_w,
           |  CAST(greatest(1, floor((n % 200 + 32) * 224.0
           |    / (n % 320 + 32) + 0.5)) AS BIGINT) AS resized_h,
           |  (200 * sm + n) // (2 * n) AS luma_x100
           |FROM s""".stripMargin),
    (s, d) => {
      val spark = s
      import spark.implicits._
      val payloads = t(s, d, "documents")
        // ASCII-only guard: keeps the byte-level stub oracle-checkable
        // (SQL sees characters; bytes == characters only under ASCII)
        .filter(octet_length(col("text").cast("binary")) === length(col("text"))
          && col("text") =!= "")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
      val targetW = 224L // resize target (vision-model input size)
      payloads.mapPartitions { it =>
        it.map { case (id, bytes) =>
          // STUB: deterministic fake of an image decode. Real impl: hand
          // `bytes` to a codec and emit true dimensions + features.
          val n = bytes.length.toLong
          val w = n % 320 + 32
          val h = n % 200 + 32
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
          // resize stub: aspect-preserving scale to targetW wide — the
          // arithmetic a real resampler applies, minus the pixels
          val rh = math.max(1L, math.round(h * targetW.toDouble / w))
          // mean luma as exact x100 fixed-point (half-up): identical
          // integer arithmetic on both engines, no float rounding
          val lumaX100 = (200L * sum + n) / (2L * n)
          (id, w, h, targetW, rh, lumaX100)
        }
      }.toDF("doc_id", "width", "height", "resized_w", "resized_h",
        "luma_x100")
    })

  /** Frame sampling: treat the payload as a "video" of fixed-size frames
    * and emit every k-th frame as its own row with a feature stub — the
    * one-to-many partition-wise expansion a video pipeline runs (decode
    * stubbed; schema/batching/distribution real). Output is bounded by
    * maxFrames per document, so row explosion is controlled. Like q53,
    * the stub arithmetic is deterministic and oracle-checked exactly
    * (ASCII guard + x100 fixed-point frame luma). */
  val frameSample: NamedQuery = NamedQuery("q54b_multimodal_frames",
    // frames: every 4th 64-byte window, capped at 8 frames → frame_idx
    // in range(0, least(n//64, 29), 4); each sampled frame is full-width
    Some("""WITH a AS (SELECT doc_id, text,
           |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n
           |  FROM documents
           |  WHERE octet_length(CAST(text AS BLOB)) = length(text)),
           |f AS (SELECT doc_id, text,
           |    unnest(range(0, CAST(least(n // 64, 29) AS INT), 4)) AS fi
           |  FROM a)
           |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
           |  CAST(64 AS BIGINT) AS frame_bytes,
           |  (200 * CAST(list_sum(list_transform(range(1, 65),
           |     i -> ascii(substr(text, CAST(fi * 64 + i AS INT), 1))))
           |   AS BIGINT) + 64) // 128 AS luma_x100
           |FROM f""".stripMargin),
    (s, d) => {
      val spark = s
      import spark.implicits._
      val frameBytes = 64
      val stride = 4
      val maxFrames = 8
      t(s, d, "documents")
        .filter(octet_length(col("text").cast("binary")) === length(col("text")))
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, bytes) =>
          // STUB decode: fixed-size byte windows stand in for frames
          val nFrames = bytes.length / frameBytes
          (0 until nFrames by stride).take(maxFrames).map { f =>
            val frame = bytes.slice(f * frameBytes, (f + 1) * frameBytes)
            var sum = 0L
            var i = 0
            while (i < frame.length) { sum += frame(i) & 0xff; i += 1 }
            (id, f.toLong, frame.length.toLong,
              (200L * sum + frame.length) / (2L * frame.length))
          }
        }
        .toDF("doc_id", "frame_idx", "frame_bytes", "luma_x100")
    })

  def defs: Seq[NamedQuery] = Seq(meta, decode, frameSample)
}
