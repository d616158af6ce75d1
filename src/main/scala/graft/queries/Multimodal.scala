package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions.sqlPolyHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column suite (SURVEY.md §2 F1–F2): media as opaque `binary`
  * columns with typed metadata.
  *
  * The test corpus has no real media files, so the binary column is
  * SYNTHESIZED deterministically (a real magic-byte header + the doc text
  * as payload bytes). Everything downstream of synthesis — binary sizing,
  * hashing, magic-byte sniffing, batched feature extraction — is the real
  * plumbing a media pipeline needs and is exercised for real; only the
  * codec is fake (see [[graft.media.MediaCodec]]).
  */
object Multimodal {

  private val headers = Seq("89504E47", "FFD8FFE0", "49443303", "52494646")
  private val kinds = Seq("png", "jpeg", "mp3", "riff")

  /** doc_id-keyed synthetic media table: binary content with a genuine
    * magic header. Shared by F1/F2 and the media specs. */
  def mediaTable(s: SparkSession, d: String): DataFrame = {
    val header = coalesce(
      (0 until 4).map(i => when(col("doc_id") % 4 === i, headers(i))): _*)
    Tables.documents(s, d)
      .select(col("doc_id"),
        concat(unhex(header), encode(col("text"), "UTF-8")).as("content"))
  }

  /** F1: opaque-binary metadata — size, content hash, magic-byte sniff.
    * The sniff reads the BYTES (not the label that produced them): a
    * corrupted or mislabeled blob classifies as its actual content. Pure
    * map stage; at 100 TB this runs in the parquet scan projection. */
  /** Public API: binary metadata over any (doc_id, content: binary)
    * frame. */
  def binaryMeta(media: DataFrame): DataFrame = {
      val magic = upper(hex(substring(col("content"), 1, 4)))
      media
        .select(col("doc_id"),
          length(col("content")).cast("long").as("n_bytes"),
          md5(hex(col("content"))).as("content_md5"),
          magic.as("magic"),
          coalesce((0 until 4).map(i => when(magic === headers(i), kinds(i))) :+
            lit("unknown"): _*).as("sniffed_type"))
        .orderBy("doc_id")
  }

  val qBinaryMeta: Q = Q(
    "q_binary_meta",
    (s, d) => binaryMeta(mediaTable(s, d)),
    Some {
      val bin = (0 until 4).map(i => s"WHEN doc_id % 4 = $i THEN from_hex('${headers(i)}')")
        .mkString("CASE ", " ", " END") + " || encode(text)"
      val magic = s"left(hex($bin), 8)"
      val sniff = (0 until 4).map(i => s"WHEN $magic = '${headers(i)}' THEN '${kinds(i)}'")
        .mkString("CASE ", " ", " ELSE 'unknown' END")
      s"""SELECT doc_id,
        CAST(octet_length($bin) AS BIGINT) AS n_bytes,
        md5(hex($bin)) AS content_md5,
        $magic AS magic,
        $sniff AS sniffed_type
      FROM documents ORDER BY doc_id"""
    })

  /** F2: batched media feature extraction — the mapInPandas-shaped path:
    * partitions are processed in fixed-size batches through the (stubbed)
    * codec, emitting typed features. Rows-only check + MediaSpec. */
  /** Public API: batched feature extraction over any (doc_id, content)
    * frame. */
  def mediaFeatures(media: DataFrame): DataFrame = {
      val s = media.sparkSession
      import s.implicits._
      import graft.media.MediaCodec
      media
        .select(col("doc_id"), col("content"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // fixed-size batches: the JVM analogue of mapInPandas' Arrow
          // batches — the codec sees a Seq per call, exactly like a
          // vectorized UDF sees a pandas batch.
          it.grouped(MediaCodec.BatchSize).flatMap { batch =>
            MediaCodec.decodeBatch(batch.map { case (id, bytes) => (id, bytes) })
          }
        }
        .toDF()
        .orderBy("doc_id")
  }

  /** Driver-facing F2 row: same pipeline, but the feature vector is
    * projected to scalar columns — the correctness gate sorts/hashes rows
    * and cannot order an `array<float>` column. Each f_i recovers the raw
    * 7-bit hash field behind feature[i] (= field/127f), so the row is
    * integer-exact and, because the stub decode is pure arithmetic on a
    * poly hash of the payload (= the UTF-8 bytes of `text`), fully
    * reproducible in DuckDB SQL. The library API ([[mediaFeatures]])
    * keeps the typed array. */
  val qMediaFeatures: Q = Q(
    "q_media_features",
    (s, d) => {
      val featCols = (0 until 8).map { i =>
        // feature[i] = k/127f with k in [0,127]; *127 + rint is exact
        round(element_at(col("feature"), i + 1) * 127).cast("long").as(s"f$i")
      }
      mediaFeatures(mediaTable(s, d))
        .select(Seq(col("doc_id"), col("media_type"), col("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames")) ++ featCols: _*)
        .orderBy("doc_id")
    },
    Some {
      // MediaCodec.decode reproduced in SQL: h = poly hash of the payload
      // bytes (the ASCII corpus makes byte == codepoint, same contract as
      // sqlPolyHash everywhere else); all derived fields are integer
      // arithmetic on h.
      val kindCase = (0 until 4).map(i => s"WHEN doc_id % 4 = $i THEN '${kinds(i)}'")
        .mkString("CASE ", " ", " END")
      val feats = (0 until 8)
        .map(i => s"CAST((h // ${1L << (i * 7)}) % 128 AS BIGINT) AS f$i")
        .mkString(",\n        ")
      s"""WITH h AS (SELECT doc_id, ${sqlPolyHash("text")} AS h,
          octet_length(encode(text)) AS payload_bytes FROM documents)
      SELECT doc_id,
        $kindCase AS media_type,
        CAST(payload_bytes + 4 AS BIGINT) AS n_bytes,
        CAST(64 + h % 1856 AS BIGINT) AS width,
        CAST(64 + (h // 1856) % 1016 AS BIGINT) AS height,
        CAST(CASE WHEN doc_id % 4 <= 1 THEN 1 ELSE 1 + h % 240 END AS BIGINT) AS n_frames,
        $feats
      FROM h ORDER BY doc_id"""
    })

  /** Bytes per synthetic frame (F3). */
  val FrameBytes = 64
  /** Frame-sampling stride: keep every [[FrameStride]]-th frame. */
  val FrameStride = 4

  /** F3: video frame sampling — the every-Nth-frame decimation a video
    * training pipeline runs before feature extraction (decoding every
    * frame of 100 TB of video is the single most expensive step; stride
    * sampling is how real pipelines make it tractable). Frames are
    * fixed-[[FrameBytes]] byte windows of the payload (the stub codec's
    * frame model); the BINARY path is real — header skip, frame slicing
    * and UTF-8 decode all happen on the bytes — while the per-frame
    * "features" (poly hash + a luma-like 8-bit projection) stand in for
    * the stubbed decoder exactly like F2.
    *
    * Scale shape: explode(sequence(...)) is a narrow map stage — sampled
    * frames never shuffle; at stride 4 the output is ≤ 1/4 of payload
    * bytes, and Catalyst prunes every other column into the scan. */
  def frameSample(media: DataFrame): DataFrame = {
    val payloadLen = length(col("content")) - 4
    val nFrames = ceil(payloadLen.cast("double") / FrameBytes).cast("int")
    val frame = col("content").substr(
      lit(5) + col("frame_idx") * FrameBytes, lit(FrameBytes))
    media
      .select(col("doc_id"), col("content"),
        // guard: a blob shorter than the header has 0 frames — explode
        // of the empty array yields no rows (sequence(0, -1, k) would
        // throw), matching the oracle's empty generate_series
        explode(when(nFrames > 0,
          sequence(lit(0), nFrames - 1, lit(FrameStride)))
          .otherwise(array()))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(frame).cast("long").as("frame_bytes"),
        graft.functions.TextFunctions.polyHash(decode(frame, "UTF-8"))
          .as("f_hash"))
      .withColumn("luma", col("f_hash") % 256)
      .orderBy("doc_id", "frame_idx")
  }

  /** Driver-facing F3 row: sampled frames of the video-typed (riff)
    * media docs. The payload is the doc text's UTF-8 bytes, so DuckDB
    * reproduces every frame by char slicing (ASCII corpus: byte ==
    * codepoint — same contract as sqlPolyHash everywhere else). */
  val qFrameSample: Q = Q(
    "q_frame_sample",
    (s, d) => frameSample(mediaTable(s, d).filter(col("doc_id") % 4 === 3)),
    Some(s"""WITH vids AS (
        SELECT doc_id, text,
          CAST(ceil(octet_length(encode(text)) / ${FrameBytes}.0::DOUBLE) AS BIGINT) AS nf
        FROM documents WHERE doc_id % 4 = 3),
      idxed AS (
        SELECT doc_id, text,
          unnest(generate_series(0, nf - 1, $FrameStride)) AS frame_idx
        FROM vids),
      fr AS (
        SELECT doc_id, frame_idx,
          substr(text, CAST(frame_idx * $FrameBytes + 1 AS INT), $FrameBytes) AS frame
        FROM idxed)
      SELECT doc_id,
        CAST(frame_idx AS BIGINT) AS frame_idx,
        CAST(octet_length(encode(frame)) AS BIGINT) AS frame_bytes,
        ${sqlPolyHash("frame")} AS f_hash,
        ${sqlPolyHash("frame")} % 256 AS luma
      FROM fr ORDER BY doc_id, frame_idx"""))

  val all: Seq[Q] = Seq(qBinaryMeta, qMediaFeatures, qFrameSample)
}
