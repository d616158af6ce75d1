package graft.queries

import graft.{Q, Tables}
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

  val qMediaFeatures: Q = Q(
    "q_media_features",
    (s, d) => mediaFeatures(mediaTable(s, d)),
    None)

  val all: Seq[Q] = Seq(qBinaryMeta, qMediaFeatures)
}
