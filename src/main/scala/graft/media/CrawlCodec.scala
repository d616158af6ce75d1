package graft.media

import java.nio.charset.StandardCharsets.UTF_8

/** One framed crawl record: its position in the file, the target URL,
  * the body byte count, and the body decoded as UTF-8. */
final case class CrawlRecord(
    file_id: Long,
    rec_idx: Long,
    url: String,
    n_bytes: Long,
    html: String)

/** WARC-style record framing (SURVEY.md §2 C29) — the crawl
  * front-end's FIRST step: raw binary crawl-file payloads → (url,
  * html) rows, BEFORE C26's URL gate and C25's extraction can run.
  *
  * The frame is the WARC convention in miniature: per record a
  * `WARC/1.0` magic line, `WARC-Target-URI` and `Content-Length`
  * header lines, a blank line, `Content-Length` BODY BYTES, and a
  * blank-line trailer (CRLF line ends throughout). Splitting is
  * LENGTH-PREFIXED, never delimiter-scanned — HTML bodies legally
  * contain every delimiter (blank lines, even the magic string), and
  * only the declared byte count walks the frame correctly; the
  * CrawlCodecSpec plants exactly those adversarial bodies.
  *
  * Damage contract: parsing is strictly sequential per file, so a
  * malformed/truncated record ends that FILE's parse — every record
  * before the damage is emitted intact, everything after the damage
  * is unrecoverable without resynchronization (the honest WARC
  * posture; real crawlers re-split at the next magic, which a
  * length-lie can defeat — we stop rather than guess). Other files
  * are unaffected (per-file independence is the parallel unit).
  *
  * This object is the F2-style codec seam: a REAL (ISO 28500) WARC
  * parser — gzip members, full header sets — drops in here, and the
  * Spark-side plumbing ([[graft.queries.CrawlRecords]]: binary
  * columns in, typed flatMap out, per-file parallelism) is unchanged.
  * Unlike [[MediaCodec]] nothing here is stubbed: the framing is
  * deterministic byte arithmetic this container runs for real.
  */
object CrawlCodec {

  private val Magic = "WARC/1.0\r\n".getBytes(UTF_8)
  private val UriKey = "WARC-Target-URI: "
  private val LenKey = "Content-Length: "

  private def startsWith(p: Array[Byte], at: Int, pre: Array[Byte]): Boolean = {
    if (at < 0 || at + pre.length > p.length) return false
    var i = 0
    while (i < pre.length) {
      if (p(at + i) != pre(i)) return false
      i += 1
    }
    true
  }

  private def lineEnd(p: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < p.length) {
      if (p(i) == '\r'.toByte && p(i + 1) == '\n'.toByte) return i
      i += 1
    }
    -1
  }

  /** Parse one file's payload into its complete records (see the
    * damage contract above). */
  def parse(fileId: Long, payload: Array[Byte]): Seq[CrawlRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[CrawlRecord]
    val trailer = "\r\n\r\n".getBytes(UTF_8)
    var i = 0
    var idx = 0L
    while (i < payload.length) {
      if (!startsWith(payload, i, Magic)) return out.toSeq
      var j = i + Magic.length
      var url: String = null
      var len = -1L
      var headersDone = false
      var ok = true
      while (!headersDone && ok) {
        val e = lineEnd(payload, j)
        if (e < 0) ok = false
        else {
          val line = new String(payload, j, e - j, UTF_8)
          if (line.isEmpty) headersDone = true
          else if (line.startsWith(UriKey)) url = line.substring(UriKey.length)
          else if (line.startsWith(LenKey)) {
            len = try line.substring(LenKey.length).toLong catch {
              case _: NumberFormatException => -1L
            }
          }
          j = e + 2
        }
      }
      if (!ok || url == null || len < 0 ||
        len > Int.MaxValue.toLong || j + len + trailer.length > payload.length ||
        !startsWith(payload, j + len.toInt, trailer)) return out.toSeq
      out += CrawlRecord(fileId, idx,
        url, len, new String(payload, j, len.toInt, UTF_8))
      idx += 1
      i = j + len.toInt + trailer.length
    }
    out.toSeq
  }

  /** Parse a `.warc.gz`-style payload: a CONCATENATION OF GZIP
    * MEMBERS (the ISO 28500 convention — each record compressed as
    * its own member, members back to back), inflated member-by-member
    * by GZIPInputStream (which walks consecutive member headers) and
    * then framed-parsed exactly as [[parse]]. Damage contract carried
    * through the compression layer: a truncated or corrupt member
    * ends THAT FILE's inflation at the last whole byte run — every
    * record fully inflated before the damage is emitted intact
    * (lengths still checked against Content-Length by the frame
    * parse), everything after is unrecoverable without
    * resynchronization, and other files are untouched. */
  def parseGzip(fileId: Long, payload: Array[Byte]): Seq[CrawlRecord] = {
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(payload))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
    } catch {
      // truncated/corrupt member or trailing garbage: keep what
      // inflated cleanly — the frame parse below stops at the first
      // incomplete record (the documented damage posture)
      case _: java.io.IOException => ()
    }
    parse(fileId, out.toByteArray)
  }

  /** Frame one record as its own GZIP MEMBER — the `.warc.gz` writer
    * side; concatenate members to build a file. [[parseGzip]] inverts
    * the concatenation exactly. Java's GZIPOutputStream writes a
    * zeroed MTIME header, so the bytes are deterministic for
    * deterministic input. */
  def frameGzip(url: String, body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(frame(url, body))
    gz.finish()
    gz.close()
    bos.toByteArray
  }

  /** Frame one record — the writer side, used by the synthetic corpus
    * builder and any staging sink; `parse` inverts it exactly. The url
    * lands on a CRLF-terminated header line, so a url containing CR/LF
    * would corrupt the header block and break the parse-inverts-frame
    * invariant for the rest of the file (a round-14 advisor finding) —
    * rejected loudly here rather than written corrupt; real crawl
    * front-ends percent-encode control characters before this point
    * (C26's gate already drops such urls). */
  def frame(url: String, body: Array[Byte]): Array[Byte] = {
    require(!url.exists(c => c == '\r' || c == '\n'),
      "CrawlCodec.frame: url must not contain CR/LF (percent-encode control characters first)")
    val head = (s"WARC/1.0\r\n$UriKey$url\r\n$LenKey${body.length}\r\n\r\n")
      .getBytes(UTF_8)
    head ++ body ++ "\r\n\r\n".getBytes(UTF_8)
  }
}
