package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Multimodal-column plumbing over REAL image bytes: media as opaque
  * `binary` payloads ingested through `spark.read.format("binaryFile")`
  * and decoded per partition with [[ImageCodec]] — spec-valid PNG
  * (full pixel decode: chunk walk, CRC verify, inflate, five-filter
  * reconstruction), GIF (logical screen + per-frame container walk over
  * real LZW-coded frames), and JPEG (SOF dimension probe).
  *
  * Fixtures: the container ships no media, so each `documents` row is
  * materialized once per scale dir as a real image FILE whose format
  * and content are deterministic functions of `doc_id` (PNG pixels
  * v(k) = (doc_id + k) mod 256, GIF frame geometry from small moduli).
  * That determinism is what makes every query oracle-checkable: DuckDB
  * recomputes the expected dimensions / pixel sums / frame tables from
  * `doc_id` alone, so a decoder that misreads a single header byte,
  * mis-inverts a scanline filter, or drops a frame hash-mismatches.
  * The encode side is independently pinned against public reference
  * bytes (the canonical 1×1 PNG) in MediaDecodeSpec, so encoder and
  * decoder cannot be compensatingly wrong about the chunk layout.
  *
  * Scale shape: one file per document here; at 100 TB the same decode
  * runs over binary columns or an object-store manifest, still
  * partition-wise with no driver materialization — `binaryFile` is the
  * ingestion spelling of that path (each task reads only its files'
  * bytes; the decode is O(payload) per row, embarrassingly parallel). */
object MultimodalOps {

  /** Deterministic per-doc fixture parameters — the single source the
    * Scala encoder and the DuckDB oracle SQL both derive from. */
  private def pngDims(id: Long): (Int, Int) =
    ((id % 48 + 8).toInt, (id % 32 + 8).toInt)
  private def screenDims(id: Long): (Int, Int) =
    ((id % 300 + 16).toInt, (id % 200 + 16).toInt)

  private val memoFixtures =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Materialize the media fixture directory for scale dir `d` (once
    * per JVM): one real image file per document, format by
    * `doc_id % 3` (png / gif / jpeg). Written partition-wise — on a
    * cluster this lands on shared storage, exactly like a fixture
    * corpus would. */
  private[graft] def mediaFixtures(s: SparkSession, d: String): String =
    memoFixtures.getOrElseUpdate(d, {
      val dir = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        s"graft_media_${ProcessHandle.current.pid}_" +
          d.replaceAll("[^a-zA-Z0-9]", "_"))
      java.nio.file.Files.createDirectories(dir)
      val dirStr = dir.toString
      val spark = s
      import spark.implicits._
      t(s, d, "documents").select("doc_id").as[Long]
        .foreachPartition { (it: Iterator[Long]) =>
          it.foreach { id =>
            val (name, bytes) = (id % 3) match {
              case 0 =>
                val (w, h) = pngDims(id)
                (s"doc$id.png",
                  ImageCodec.encodePng(w, h, k => ((id + k) % 256).toInt))
              case 1 =>
                val (w, h) = screenDims(id)
                val frames = (0 until (id % 5 + 1).toInt).map { k =>
                  (k % 4, k % 3, ((id + k) % 10 + 2).toInt,
                    ((id + 2L * k) % 9 + 2).toInt,
                    ((id * 3 + k) % 100).toInt, ((id + k) % 128).toInt)
                }
                (s"doc$id.gif", ImageCodec.encodeGif(w, h, frames))
              case _ =>
                val (w, h) = screenDims(id)
                (s"doc$id.jpg", ImageCodec.encodeJpegHeader(w, h))
            }
            java.nio.file.Files.write(
              java.nio.file.Paths.get(dirStr, name), bytes)
          }
        }
      dirStr
    })

  /** Audio fixture params — like the image fixtures, a deterministic
    * function of doc_id shared by the Scala encoder and the DuckDB
    * oracle. Mono 16-bit PCM; audio docs are the `doc_id % 3 == 2`
    * stratum (the one whose image coverage is header-only). */
  private[graft] def wavParams(id: Long): (Int, Int) = {
    val n = (id % 200 + 50).toInt
    val rate = if (id % 2 == 0) 8000 else 16000
    (rate, n)
  }
  private[graft] def wavSample(id: Long)(k: Int): Int =
    ((id * 7 + k * 13L) % 4096 - 2048).toInt

  /** Materialize the audio fixture directory for scale dir `d` (once
    * per JVM): one real PCM WAV per audio-stratum document. */
  private[graft] def audioFixtures(s: SparkSession, d: String): String =
    memoFixtures.getOrElseUpdate("audio:" + d, {
      val dir = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        s"graft_audio_${ProcessHandle.current.pid}_" +
          d.replaceAll("[^a-zA-Z0-9]", "_"))
      java.nio.file.Files.createDirectories(dir)
      val dirStr = dir.toString
      val spark = s
      import spark.implicits._
      t(s, d, "documents").select("doc_id").as[Long]
        .filter((id: Long) => id % 3 == 2)
        .foreachPartition { (it: Iterator[Long]) =>
          it.foreach { id =>
            val (rate, n) = wavParams(id)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(dirStr, s"doc$id.wav"),
              AudioCodec.encodeWav(rate, n, wavSample(id)))
          }
        }
      dirStr
    })

  private def docId(path: String): Long = {
    val m = "doc(\\d+)\\.".r.findFirstMatchIn(path)
    m.fold(throw new IllegalArgumentException(s"unparseable path $path"))(
      _.group(1).toLong)
  }

  /** Media corpus as a binary-column frame: (doc_id, content). */
  private def mediaBytes(s: SparkSession, d: String) = {
    val spark = s
    import spark.implicits._
    s.read.format("binaryFile").load(mediaFixtures(s, d))
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, bytes) => (docId(p), bytes) }
  }

  /** Header-level metadata over the binary payloads: format sniff +
    * dimension probe (PNG IHDR / GIF logical screen / JPEG SOF) — the
    * O(header-bytes) fast path a 100 TB media pipeline runs before any
    * pixel work. Oracle: DuckDB recomputes the expected triple from
    * doc_id (the fixtures' generating functions). */
  val meta: NamedQuery = NamedQuery("q52_multimodal_meta",
    Some("""SELECT doc_id,
           |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
           |       WHEN 1 THEN 'gif' ELSE 'jpeg' END AS format,
           |  CASE WHEN doc_id % 3 = 0 THEN doc_id % 48 + 8
           |       ELSE doc_id % 300 + 16 END AS width,
           |  CASE WHEN doc_id % 3 = 0 THEN doc_id % 32 + 8
           |       ELSE doc_id % 200 + 16 END AS height
           |FROM documents""".stripMargin),
    (s, d) => {
      val spark = s
      import spark.implicits._
      mediaBytes(s, d).mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (fmt, w, h) = ImageCodec.probe(bytes)
          (id, fmt, w.toLong, h.toLong)
        }
      }.toDF("doc_id", "format", "width", "height")
    })

  /** Full PNG decode over the binary payloads: signature + chunk walk
    * with CRC32 verification, zlib inflate, five-filter scanline
    * reconstruction, then real pixel statistics (integer Rec.601 luma,
    * ×100 fixed-point) and the aspect-preserving resize arithmetic.
    * Oracle: DuckDB recomputes dimensions AND the exact pixel sum from
    * the generating function — a wrong defilter or a dropped scanline
    * hash-mismatches. */
  val decode: NamedQuery = NamedQuery("q53_multimodal_decode",
    Some("""WITH p AS (SELECT doc_id, doc_id % 48 + 8 AS w,
           |    doc_id % 32 + 8 AS h
           |  FROM documents WHERE doc_id % 3 = 0)
           |SELECT doc_id, w AS width, h AS height, w * h AS n_pixels,
           |  CAST(224 AS BIGINT) AS resized_w,
           |  CAST(greatest(1, floor(h * 224.0 / w + 0.5)) AS BIGINT)
           |    AS resized_h,
           |  (200 * CAST(list_sum(list_transform(
           |       range(0, CAST(w * h AS INT)),
           |       k -> (doc_id + k) % 256)) AS BIGINT) + w * h)
           |    // (2 * w * h) AS luma_x100
           |FROM p""".stripMargin),
    (s, d) => {
      val spark = s
      import spark.implicits._
      val targetW = 224L // resize target (vision-model input size)
      mediaBytes(s, d)
        .filter(kv => kv._1 % 3 == 0)
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            val img = ImageCodec.decodePng(bytes)
            val w = img.width.toLong; val h = img.height.toLong
            val rh = math.max(1L, math.round(h * targetW.toDouble / w))
            (id, w, h, w * h, targetW, rh, ImageCodec.meanLumaX100(img))
          }
        }.toDF("doc_id", "width", "height", "n_pixels", "resized_w",
          "resized_h", "luma_x100")
    })

  /** Frame sampling over the GIF payloads: the container-structure walk
    * (descriptors, control extensions, LZW sub-block skip) that emits
    * one row per frame — the one-to-many expansion a video pipeline's
    * frame sampler runs at the container level. Oracle: the fixtures'
    * frame table regenerated from doc_id. */
  val frameSample: NamedQuery = NamedQuery("q54b_multimodal_frames",
    Some("""WITH g AS (SELECT doc_id, CAST(doc_id % 5 + 1 AS INT) AS nf
           |  FROM documents WHERE doc_id % 3 = 1),
           |f AS (SELECT doc_id, unnest(range(0, nf)) AS k FROM g)
           |SELECT doc_id, CAST(k AS BIGINT) AS frame_idx,
           |  CAST(k % 4 AS BIGINT) AS x, CAST(k % 3 AS BIGINT) AS y,
           |  (doc_id + k) % 10 + 2 AS w, (doc_id + 2 * k) % 9 + 2 AS h,
           |  (doc_id * 3 + k) % 100 AS delay_cs
           |FROM f""".stripMargin),
    (s, d) => {
      val spark = s
      import spark.implicits._
      mediaBytes(s, d)
        .filter(kv => kv._1 % 3 == 1)
        .flatMap { case (id, bytes) =>
          val (_, _, frames) = ImageCodec.parseGif(bytes)
          frames.map(f => (id, f.index.toLong, f.x.toLong, f.y.toLong,
            f.width.toLong, f.height.toLong, f.delayCs.toLong))
        }.toDF("doc_id", "frame_idx", "x", "y", "w", "h", "delay_cs")
    })

  /** Audio decode over real PCM WAV payloads: RIFF chunk walk (fmt
    * parse, LIST skip), 16-bit sample extraction, then exact integer
    * signal statistics (peak amplitude, energy) plus the duration and
    * resample arithmetic an audio pipeline stamps per clip. Oracle:
    * DuckDB regenerates the expected stats from the fixtures'
    * generating function — a mis-read sample width, a chunk-walk
    * misalignment, or a dropped sample hash-mismatches. */
  val audio: NamedQuery = NamedQuery("q180_multimodal_audio",
    Some("""WITH a AS (SELECT doc_id,
           |    CAST(doc_id % 200 + 50 AS BIGINT) AS n,
           |    CAST(CASE WHEN doc_id % 2 = 0 THEN 8000
           |         ELSE 16000 END AS BIGINT) AS rate
           |  FROM documents WHERE doc_id % 3 = 2)
           |SELECT doc_id, rate AS sample_rate, n AS n_samples,
           |  n * 1000 // rate AS duration_ms,
           |  CAST(list_max(list_transform(range(0, CAST(n AS INT)),
           |    k -> abs((doc_id * 7 + k * 13) % 4096 - 2048)))
           |    AS BIGINT) AS peak_abs,
           |  CAST(list_sum(list_transform(range(0, CAST(n AS INT)),
           |    k -> ((doc_id * 7 + k * 13) % 4096 - 2048)
           |       * ((doc_id * 7 + k * 13) % 4096 - 2048)))
           |    AS BIGINT) AS energy,
           |  n * 16000 // rate AS resampled_n
           |FROM a""".stripMargin),
    (s, d) => {
      val spark = s
      import spark.implicits._
      s.read.format("binaryFile").load(audioFixtures(s, d))
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (p, bytes) =>
            val id = docId(p)
            val w = AudioCodec.parseWav(bytes)
            var peak = 0L; var energy = 0L
            for (v <- w.samples) {
              val a = math.abs(v.toLong)
              if (a > peak) peak = a
              energy += v.toLong * v.toLong
            }
            val n = w.samples.length.toLong
            (id, w.sampleRate.toLong, n, n * 1000 / w.sampleRate,
              peak, energy, n * 16000 / w.sampleRate)
          }
        }.toDF("doc_id", "sample_rate", "n_samples", "duration_ms",
          "peak_abs", "energy", "resampled_n")
    })

  def defs: Seq[NamedQuery] = Seq(meta, decode, frameSample, audio)
}
