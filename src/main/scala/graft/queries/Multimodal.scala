package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions.sqlPolyHash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Any (doc_id, text) frame → the synthetic media shape: binary
    * content with a genuine magic header chosen by doc_id mod 4.
    * Null text degrades to the empty payload (the C18/C20 convention),
    * which also makes `content` NON-nullable — without that, the F4
    * join's inferred `isnotnull(blockhash(content))` pushes into the
    * scan filter and evaluates the O(L) fingerprint kernel twice per
    * row (observed in the plan audit). */
  private def mediaFrom(docs: DataFrame): DataFrame = {
    val header = coalesce(
      (0 until 4).map(i => when(col("doc_id") % 4 === i, headers(i))) :+
        lit(""): _*)
    docs.select(col("doc_id"),
      concat(unhex(header),
        encode(coalesce(col("text"), lit("")), "UTF-8")).as("content"))
  }

  /** doc_id-keyed synthetic media table: binary content with a genuine
    * magic header. Shared by F1/F2 and the media specs. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    mediaFrom(Tables.documents(s, d))

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

  /** F4: perceptual-hash near-duplicate media detection — the image
    * side of the dedup story (a re-saved, re-compressed, or
    * block-corrupted copy of the same image defeats the F1 byte hash;
    * its perceptual fingerprint doesn't). Model: BLOCKHASH (Yang et al.'s
    * block-mean hash — the pHash family member that needs no DCT):
    * the payload is cut into 64 length-proportional windows and bit i
    * is a parity statistic of window i, so a local corruption flips
    * only its window's bit while a different image scrambles ~32 of
    * 64. With the stubbed codec the "pixels" are the payload bytes
    * and the parity statistic is the portable poly hash mod 2 —
    * deterministic, SQL-exact, and honestly documented as the stub
    * (a real codec swaps pixel means in via [[graft.media.MediaCodec]]
    * without touching the banded join). Pairing is EXACTLY D3's
    * machinery ([[Dedup.hammingBandedPairs]] — the Manku 3-of-8 block
    * combination join, provably ≡ brute force at Hamming ≤ 5); the
    * oracle RUNS the quadratic brute force, so hash-green proves the
    * banded plan lossless on this corpus, same as the D3 row.
    *
    * Known blind spot, by design: a LENGTH change shifts every window
    * boundary after it, so insert/delete edits read as different
    * images (real blockhash has the same property under crop/resize
    * without re-normalization). The oracle row plants same-length
    * single-block corruptions — the re-encode scenario the operator
    * exists to catch. */
  def blockHash64(payload: Column): Column =
    graft.functions.NativeExpressions.blockHash64(payload)

  /** The compositional 64×(substr → poly-hash → parity) formulation the
    * kernel replaces — semantically identical (MediaSpec differential),
    * kept because it documents the window math the oracle SQL replays.
    * Not for plans: it evaluates O(64·L) per row and its expression tree
    * is big enough to disable whole-stage codegen (observed). */
  private[graft] def blockHash64Relational(payload: Column): Column = {
    val L = length(payload).cast("long")
    // window i: 1-based chars [(i*L)>>6 + 1, ((i+1)*L)>>6]; shiftRight
    // keeps the boundary math in exact integer arithmetic
    (0 until 64).map { i =>
      val lo = shiftright(L * i, 6)
      val wlen = shiftright(L * (i + 1), 6) - lo
      val bit = pmod(graft.functions.TextFunctions.polyHash(
        payload.substr((lo + 1L).cast("int"), wlen.cast("int"))), lit(2L))
      shiftleft(bit, i)
    }.reduce(_.bitwiseOR(_))
  }

  /** Near-dup media pairs at Hamming ≤ 5 over the blockhash
    * fingerprint of the payload (header bytes excluded — perceptual
    * identity is about content, not container). */
  def mediaNearDup(media: DataFrame): DataFrame =
    Dedup.hammingBandedPairs(
      media.select(col("doc_id"),
        // coalesce makes fp NON-nullable (unhex upstream is
        // always-nullable), so the join infers no isnotnull(fp) —
        // without it that inferred filter pushes to the scan and runs
        // the O(L) kernel a second time per row (seen in PLANS.md);
        // a null payload (no real row has one) would fingerprint as 0
        coalesce(blockHash64(decode(
          col("content").substr(lit(5), length(col("content")) - 4),
          "UTF-8")), lit(0L)).as("fp")))

  /** Oracle-row corpus: the media table plus a "re-encode" of every
    * 10th doc — same payload with the LAST char overwritten (one
    * corrupted trailing block, same length), id offset by 10^6 (a
    * multiple of 4, so the twin keeps its format header). */
  private val ReencodeOffset = 1000000L

  private def mediaWithReencodes(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val corrupted = when(length(col("text")) >= 1,
      concat(col("text").substr(lit(1), length(col("text")) - 1), lit("x")))
      .otherwise(lit("x"))
    mediaFrom(docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + ReencodeOffset).as("doc_id"),
          corrupted.as("text"))))
  }

  val qMediaNeardup: Q = Q(
    "q_media_neardup",
    (s, d) => mediaNearDup(mediaWithReencodes(s, d)),
    Some {
      // brute-force quadratic oracle (the D3 proof pattern): 64 window
      // parities per doc, fingerprint as lo/hi 32-bit halves (BIGINT
      // cannot hold a set bit 63), every pair compared
      def bitExpr(i: Int): String = {
        val lo = s"((length(text) * $i) // 64)"
        val wlen = s"((length(text) * ${i + 1}) // 64) - $lo"
        s"""CASE WHEN $wlen = 0 THEN 0 ELSE
          ${sqlPolyHash(s"substr(text, CAST($lo + 1 AS INT), CAST($wlen AS INT))")} % 2 END"""
      }
      val loSum = (0 until 32)
        .map(i => s"(CASE WHEN b$i = 1 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
      val hiSum = (32 until 64)
        .map(i => s"(CASE WHEN b$i = 1 THEN ${1L << (i - 32)} ELSE 0 END)").mkString(" + ")
      val bitCols = (0 until 64).map(i => s"${bitExpr(i)} AS b$i").mkString(",\n        ")
      s"""WITH med AS (
        SELECT doc_id, coalesce(text, '') AS text FROM documents
        UNION ALL
        SELECT doc_id + $ReencodeOffset,
          CASE WHEN length(text) >= 1
            THEN substr(text, 1, length(text) - 1) || 'x' ELSE 'x' END
        FROM documents WHERE doc_id % 10 = 0),
      bits AS (SELECT doc_id, $bitCols FROM med),
      fp AS (SELECT doc_id, $loSum AS f_lo, $hiSum AS f_hi FROM bits)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(bit_count(xor(a.f_lo, b.f_lo)) + bit_count(xor(a.f_hi, b.f_hi)) AS BIGINT) AS hamming
      FROM fp a JOIN fp b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.f_lo, b.f_lo)) + bit_count(xor(a.f_hi, b.f_hi)) <= 5
      ORDER BY id_a, id_b"""
    })

  val all: Seq[Q] = Seq(qBinaryMeta, qMediaFeatures, qFrameSample, qMediaNeardup)
}
