package graft.media

/** Typed feature record produced by the (stubbed) media codec. */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    feature: Array[Float])

/** STUB media codec (SURVEY.md §2 F2).
  *
  * This container ships no image/audio libraries, so `decode` is a
  * deterministic fake: it sniffs the real magic bytes, then derives
  * width/height/frame-count/features from a rolling hash of the payload.
  * The Spark-side plumbing around it — binary columns in, fixed-size
  * batches through `mapPartitions`, typed feature rows out — is the real
  * production shape; swapping in a real codec changes ONLY this object.
  */
object MediaCodec {

  /** Records per codec call — the Arrow-batch-size analogue. */
  val BatchSize = 32

  private val magics = Seq(
    "89504E47" -> "png", "FFD8FFE0" -> "jpeg",
    "49443303" -> "mp3", "52494646" -> "riff")

  private def hexPrefix(b: Array[Byte], n: Int): String =
    b.take(n).map(x => f"${x & 0xff}%02X").mkString

  def sniff(bytes: Array[Byte]): String =
    magics.collectFirst { case (m, k) if hexPrefix(bytes, 4) == m => k }
      .getOrElse("unknown")

  private def poly(bytes: Array[Byte], from: Int): Long = {
    var acc = 0L
    var i = from
    while (i < bytes.length) { acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    acc
  }

  /** Fake-decode one blob. Deterministic in the bytes alone. */
  def decode(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    val kind = sniff(bytes)
    val h = poly(bytes, 4)
    val w = 64 + (h % 1856).toInt
    val ht = 64 + ((h / 1856) % 1016).toInt
    val frames = kind match {
      case "png" | "jpeg" => 1
      case _              => 1 + (h % 240).toInt // fake frame/sample count
    }
    val feat = Array.tabulate(8)(i => (((h >> (i * 7)) & 0x7f).toFloat / 127.0f))
    MediaFeatures(docId, kind, bytes.length.toLong, w, ht, frames, feat)
  }

  /** Batch entry point — the codec-facing contract used by F2's
    * `mapPartitions`. Real codecs amortize per-call setup across the
    * batch, which is why the batching exists at all. */
  def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] =
    batch.map { case (id, bytes) => decode(id, bytes) }
}
