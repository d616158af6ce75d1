package graft

import graft.queries.UrlFilter

/** C26 [[UrlFilter.urlFilter]]: parsing (scheme/host/registrable
  * domain incl. two-level suffixes and subdomain reduction), each flag
  * on planted URLs, the kept composition, and the documented edges
  * (missing scheme, IP hosts, null URL, dotless host, case rules). */
class UrlFilterSpec extends SparkSpec {
  import spark.implicits._

  private val Blocked = Seq("badsite.com", "evil.co.uk")
  private val Words = Seq("casino", "xxx")

  private def run(urls: Seq[(Long, String)], maxLen: Int = 100) =
    UrlFilter.urlFilter(urls.toDF("doc_id", "url"),
      blockedDomains = Blocked, blockedWords = Words, maxLen = maxLen)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("parsing: scheme, host, registrable domain, two-level suffixes") {
    val out = run(Seq(
      (0L, "https://www.example.com/page"),
      (1L, "http://a.b.evil.co.uk/x"),
      (2L, "https://deep.sub.badsite.com/y?q=1"),
      (3L, "ftp://files.example.org/z"),
      (4L, "https://10.1.2.3/w"),
      (5L, "no-scheme-at-all"),
      (6L, "https://localhost/q")))
    def f(i: Long, c: String) = out(i).getAs[Any](c)
    assert(f(0L, "scheme") == "https" && f(0L, "host") == "www.example.com"
      && f(0L, "domain") == "example.com")
    // two-level suffix: registrable domain is THREE labels
    assert(f(1L, "domain") == "evil.co.uk")
    assert(f(1L, "blocked_domain") == 1L)
    // subdomain reduces to the registrable domain -> blocklist hits
    assert(f(2L, "domain") == "badsite.com" && f(2L, "blocked_domain") == 1L)
    assert(f(3L, "scheme") == "ftp" && f(3L, "bad_scheme") == 1L)
    assert(f(4L, "ip_host") == 1L && f(4L, "domain") == "10.1.2.3")
    // no scheme: empty scheme/host, bad_scheme fires, nothing else
    assert(f(5L, "scheme") == "" && f(5L, "host") == ""
      && f(5L, "bad_scheme") == 1L && f(5L, "ip_host") == 0L)
    // dotless host: domain degrades to the host itself
    assert(f(6L, "domain") == "localhost" && f(6L, "kept") == 1L)
  }

  test("word screen matches anywhere in the lowercased URL") {
    val out = run(Seq(
      (0L, "https://ok.com/play-CASINO-now"),
      (1L, "https://ok.com/xxx/clip"),
      (2L, "https://ok.com/classics")))
    assert(out(0L).getAs[Long]("blocked_word") == 1L)
    assert(out(1L).getAs[Long]("blocked_word") == 1L)
    assert(out(2L).getAs[Long]("blocked_word") == 0L)
    assert(out(2L).getAs[Long]("kept") == 1L)
  }

  test("length gate and kept composition; null url") {
    val long = "https://ok.com/" + "a" * 100
    val out = run(Seq((0L, long), (1L, "https://ok.com/a"), (2L, null)))
    assert(out(0L).getAs[Long]("too_long") == 1L && out(0L).getAs[Long]("kept") == 0L)
    assert(out(1L).getAs[Long]("kept") == 1L)
    // null url: treated as empty — bad_scheme only
    assert(out(2L).getAs[Long]("bad_scheme") == 1L)
    assert(out(2L).getAs[Long]("too_long") == 0L)
    assert(out(2L).getAs[Long]("kept") == 0L)
  }

  test("blocked domain must be the registrable domain, not a substring") {
    // "notbadsite.com" contains "badsite.com" as a substring but its
    // registrable domain differs — must NOT match the domain blocklist
    val out = run(Seq((0L, "https://notbadsite.com/x")))
    assert(out(0L).getAs[String]("domain") == "notbadsite.com")
    assert(out(0L).getAs[Long]("blocked_domain") == 0L)
  }

  test("parameter validation") {
    val df = Seq((0L, "https://a.com/")).toDF("doc_id", "url")
    intercept[IllegalArgumentException](
      UrlFilter.urlFilter(df, Nil, maxLen = 0))
    intercept[IllegalArgumentException](
      UrlFilter.urlFilter(df, Nil, blockedWords = Seq("Casino")))
    intercept[IllegalArgumentException](
      UrlFilter.urlFilter(df, Seq("BadSite.com")))
  }

  test("scheme and host compare case-insensitively (RFC 3986)") {
    val out = run(Seq(
      (0L, "HTTPS://BadSite.com/MixedPath"),
      (1L, "Http://sub.EVIL.CO.UK/x"),
      (2L, "https://OK.com/Fine")))
    // uppercase scheme/host must neither fail the scheme gate nor
    // evade the domain blocklist; the url column keeps original bytes
    assert(out(0L).getAs[Long]("bad_scheme") == 0L)
    assert(out(0L).getAs[String]("domain") == "badsite.com")
    assert(out(0L).getAs[Long]("blocked_domain") == 1L)
    assert(out(0L).getAs[String]("url") == "HTTPS://BadSite.com/MixedPath")
    assert(out(1L).getAs[String]("domain") == "evil.co.uk")
    assert(out(1L).getAs[Long]("blocked_domain") == 1L)
    assert(out(2L).getAs[Long]("kept") == 1L)
  }

  test("derived URL frame plants every flag class") {
    val docs = Tables.documents(spark, sfDir)
    val out = UrlFilter.urlFilter(UrlFilter.urlsFrom(docs),
      blockedDomains = Seq("src110.co.uk"),
      blockedWords = Seq("casino", ".xxx"), maxLen = 300)
    val sums = out.groupBy().sum("bad_scheme", "ip_host",
      "blocked_domain", "blocked_word", "too_long", "kept")
      .collect()(0)
    for (i <- 0 until 6)
      assert(sums.getLong(i) > 0L, s"flag column $i has no action")
  }
}
