package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{normText, sqlNormText}

/** C26 — URL/domain filtering: the stage BEFORE C25's markup
  * extraction in a real crawl pipeline (RefinedWeb §3.1, C4/CCNet
  * practice: URL gates run first because they are the cheapest —
  * a page rejected by its URL is never fetched, parsed, or extracted,
  * so at 100 TB this screen pays for the whole pipeline behind it).
  *
  * Per URL: parse scheme / host / registrable domain (last two labels,
  * or last three under a caller-supplied two-level public-suffix list
  * — the container has no public-suffix database, so the eTLD rule is
  * parameterized rather than baked in), then flag
  *
  *   - `bad_scheme`    — scheme outside the allowed set (http/https by
  *                       default; ftp:, javascript:, data:, missing);
  *   - `ip_host`       — dotted-quad host (crawl lore: IP-hosted pages
  *                       are overwhelmingly spam/CDN artifacts);
  *   - `blocked_domain`— registrable domain on the blocklist (the UT1/
  *                       RefinedWeb mechanism; subdomains match via
  *                       the registrable-domain reduction);
  *   - `blocked_word`  — a blocklist word occurring ANYWHERE in the
  *                       lowercased URL (the RefinedWeb word screen);
  *   - `too_long`      — URLs past maxLen are tracker/session-id junk;
  *   - `kept`          — none of the above.
  *
  * All parsing is anchored regexp extraction over the URL string —
  * ONE shuffle-free codegen map stage (the C16/C18 gate shape), no
  * URL library — and the DuckDB oracle replays the identical patterns
  * from the SAME Scala constants (the C25 discipline). Documented
  * no-DOM-style edges: no percent-decoding (a word hidden as %63asino
  * passes the word screen — real filters also run post-decode lists),
  * and userinfo (`user@host`) is not split from the host.
  */
object UrlFilter {

  // Parse patterns shared VERBATIM with the oracle SQL. Java regex and
  // RE2 agree on every construct used (anchors, classes, quantifiers).
  private[queries] val SchemeRe = """^([a-z][a-z0-9+.\-]*)://"""
  private[queries] val HostRe = """^[a-z][a-z0-9+.\-]*://([^/:?#]+)"""
  private[queries] val IpHostRe = """^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"""
  private[queries] val Dom2Re = """([^.]+\.[^.]+)$"""
  private[queries] val Dom3Re = """([^.]+\.[^.]+\.[^.]+)$"""

  /** Two-level public suffixes under which the registrable domain is
    * three labels (`example.co.uk`), not two. API default covers the
    * common ccTLD registries; real deployments pass the full list. */
  val DefaultTwoLevelTlds: Seq[String] = Seq("co.uk", "com.au", "co.jp")

  val DefaultAllowedSchemes: Seq[String] = Seq("http", "https")

  /** Sort-free core of [[urlFilter]] (the C18 c4Flags convention):
    * applies unchanged to a streaming frame
    * ([[graft.streaming.Streams.urlFilterStream]]). */
  private[graft] def urlFlags(
      urls: DataFrame,
      blockedDomains: Seq[String],
      blockedWords: Seq[String] = Nil,
      allowedSchemes: Seq[String] = DefaultAllowedSchemes,
      twoLevelTlds: Seq[String] = DefaultTwoLevelTlds,
      maxLen: Int = 2048): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    require(blockedWords.forall(w => w == w.toLowerCase),
      "blockedWords must be lowercase (they match the lowercased URL)")
    require(blockedDomains.forall(d => d == d.toLowerCase),
      "blockedDomains must be lowercase (hostnames compare case-insensitively)")
    // the suffixes are INTERPOLATED into the host regex with only dots
    // escaped — restrict them to the charset where that escaping is
    // complete, so an uppercase or regex-metachar entry fails loudly
    // here instead of silently disabling (or corrupting) the
    // three-label eTLD rule deep inside the pattern
    require(twoLevelTlds.forall(t => t.nonEmpty && t.matches("[a-z0-9.-]+")),
      "twoLevelTlds entries must be nonempty lowercase [a-z0-9.-] suffixes " +
        "(they are interpolated into the host regex)")
    require(allowedSchemes.forall(s => s == s.toLowerCase),
      "allowedSchemes must be lowercase (schemes compare case-insensitively)")
    // schemes and hostnames are case-INSENSITIVE (RFC 3986 §6.2.2.1):
    // parse the lowercased URL so "HTTPS://BadSite.com" can neither
    // fail the scheme gate nor slip past the domain blocklist; the
    // output url column keeps the original bytes (paths ARE
    // case-sensitive), scheme/host/domain report the normalized form
    val rawU = coalesce(col("url"), lit(""))
    val u = lower(rawU)
    val scheme = regexp_extract(u, SchemeRe, 1)
    val host = regexp_extract(u, HostRe, 1)
    val threeLabel =
      if (twoLevelTlds.isEmpty) lit(false)
      else host.rlike(twoLevelSuffixRe(twoLevelTlds))
    val dom2 = regexp_extract(host, Dom2Re, 1)
    val dom3 = regexp_extract(host, Dom3Re, 1)
    val domain = when(host.rlike(IpHostRe), host)
      .otherwise(coalesce(
        when(threeLabel && dom3 =!= "", dom3),
        when(dom2 =!= "", dom2),
        host))
    def flag(c: Column): Column = when(c, 1L).otherwise(0L)
    val badScheme = flag(!scheme.isin(allowedSchemes: _*))
    val ipHost = flag(host.rlike(IpHostRe))
    val blockedDomain = flag(
      if (blockedDomains.isEmpty) lit(false)
      else col("domain").isin(blockedDomains: _*))
    val blockedWord = flag(
      if (blockedWords.isEmpty) lit(false)
      else blockedWords.map(w => contains(u, lit(w))).reduce(_ || _))
    // length on the ORIGINAL bytes: Java lowercasing can change char
    // count (U+0130 -> two chars), and the SQL twin measures length(url)
    val tooLong = flag(length(rawU) > maxLen)
    urls
      .withColumn("scheme", scheme)
      .withColumn("host", host)
      .withColumn("domain", domain)
      .withColumn("bad_scheme", badScheme)
      .withColumn("ip_host", ipHost)
      .withColumn("blocked_domain", blockedDomain)
      .withColumn("blocked_word", blockedWord)
      .withColumn("too_long", tooLong)
      .withColumn("kept",
        when(col("bad_scheme") + col("ip_host") + col("blocked_domain") +
          col("blocked_word") + col("too_long") === 0L, 1L).otherwise(0L))
      .select("doc_id", "url", "scheme", "host", "domain", "bad_scheme",
        "ip_host", "blocked_domain", "blocked_word", "too_long", "kept")
  }

  /** Flag + keep per URL over any (doc_id, url) frame. Output:
    * (doc_id, url, scheme, host, domain, bad_scheme, ip_host,
    * blocked_domain, blocked_word, too_long, kept) — flags BIGINT 0/1
    * (the C16 convention). `blockedWords` must be lowercase (matched
    * against the lowercased URL). */
  def urlFilter(
      urls: DataFrame,
      blockedDomains: Seq[String],
      blockedWords: Seq[String] = Nil,
      allowedSchemes: Seq[String] = DefaultAllowedSchemes,
      twoLevelTlds: Seq[String] = DefaultTwoLevelTlds,
      maxLen: Int = 2048): DataFrame =
    urlFlags(urls, blockedDomains, blockedWords, allowedSchemes,
      twoLevelTlds, maxLen).orderBy("doc_id")

  /** `\.(co\.uk|com\.au)$` — host ends with a two-level suffix. */
  private def twoLevelSuffixRe(tlds: Seq[String]): String =
    tlds.map(_.replace(".", "\\.")).mkString("""\.(""", "|", ")$")

  // ----------------------------------------------------------------
  // derived URL frame (the derived-pages technique): the synthetic
  // corpus has no URL column, so the oracle row builds one
  // deterministically from doc_id/source/text — every flag planted
  // with real mass at every SF, both engines building the SAME string.
  // ----------------------------------------------------------------

  /** Deterministic URL per doc: scheme varies (ftp every 19th), host
    * is sub+source+mod37+tld (dotted-quad every 29th; `.xxx`, `.co.uk`
    * TLD classes by doc_id % 10; `www.`/`cdn.media.` subdomains by
    * % 4), port every 41st, a "casino" path word every 23rd, a
    * path long enough to trip maxLen every 43rd, a query string every
    * 9th. Path text = the first 40 normalized chars of the doc. */
  private[graft] def urlsFrom(docs: DataFrame): DataFrame = {
    // null text coalesces BEFORE normalization so the built URL is
    // never null (a null would flag differently across engines)
    val base = regexp_replace(
      substring(normText(coalesce(col("text"), lit(""))), 1, 40), " ", "-")
    val tld = when(col("doc_id") % 10 === 0, "xxx")
      .when(col("doc_id") % 10 === 1, "co.uk")
      .when(col("doc_id") % 10 === 2, "org")
      .when(col("doc_id") % 10 === 3, "net")
      .otherwise("com")
    val sub = when(col("doc_id") % 4 === 0, "www.")
      .when(col("doc_id") % 4 === 1, "cdn.media.")
      .otherwise("")
    val host = when(col("doc_id") % 29 === 0,
      format_string("10.0.%d.7", col("doc_id") % 250))
      .otherwise(concat(sub,
        format_string("%s%d.", col("source"), col("doc_id") % 37), tld))
    val scheme = when(col("doc_id") % 19 === 0, "ftp")
      .when(col("doc_id") % 2 === 0, "https").otherwise("http")
    val url = concat(
      scheme, lit("://"), host,
      when(col("doc_id") % 41 === 0, ":8080").otherwise(""),
      lit("/"),
      when(col("doc_id") % 23 === 0, "casino-").otherwise(""),
      base,
      when(col("doc_id") % 43 === 0, repeat(concat(lit("-"), base), 8))
        .otherwise(""),
      when(col("doc_id") % 9 === 0,
        format_string("?ref=%d", col("doc_id") % 7)).otherwise(""))
    docs.select(col("doc_id"), url.as("url"))
  }

  /** [[urlsFrom]] as a DuckDB CTE ending in `urls(doc_id, url)`. */
  private[queries] def sqlUrlsCte(tbl: String): String =
    s"""urls AS (SELECT doc_id,
      (CASE WHEN doc_id % 19 = 0 THEN 'ftp'
            WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
      || '://' ||
      (CASE WHEN doc_id % 29 = 0 THEN printf('10.0.%d.7', doc_id % 250)
            ELSE (CASE WHEN doc_id % 4 = 0 THEN 'www.'
                       WHEN doc_id % 4 = 1 THEN 'cdn.media.' ELSE '' END)
              || printf('%s%d.', source, doc_id % 37)
              || (CASE WHEN doc_id % 10 = 0 THEN 'xxx'
                       WHEN doc_id % 10 = 1 THEN 'co.uk'
                       WHEN doc_id % 10 = 2 THEN 'org'
                       WHEN doc_id % 10 = 3 THEN 'net' ELSE 'com' END) END)
      || (CASE WHEN doc_id % 41 = 0 THEN ':8080' ELSE '' END)
      || '/' || (CASE WHEN doc_id % 23 = 0 THEN 'casino-' ELSE '' END)
      || replace(substr(${sqlNormText("coalesce(text, '')")}, 1, 40), ' ', '-')
      || (CASE WHEN doc_id % 43 = 0
            THEN repeat('-' || replace(substr(${sqlNormText("coalesce(text, '')")}, 1, 40), ' ', '-'), 8)
            ELSE '' END)
      || (CASE WHEN doc_id % 9 = 0 THEN printf('?ref=%d', doc_id % 7) ELSE '' END)
      AS url FROM $tbl)"""

  /** Oracle-row parameters: blocklist entries are registrable domains
    * the generator actually emits at every SF; the word list catches
    * the planted path word and the `.xxx` TLD class; maxLen 300 trips
    * exactly the every-43rd long URLs. Shared with the SQL below. */
  private[queries] val RowBlockedDomains =
    Seq("src110.co.uk", "src113.co.uk", "src54.com", "src127.org")
  private[queries] val RowBlockedWords = Seq("casino", ".xxx")
  private[queries] val RowMaxLen = 300

  private def sqlQ(s: String): String = "'" + s.replace("'", "''") + "'"

  val qUrlFilter: Q = Q(
    "q_url_filter",
    (s, d) => urlFilter(urlsFrom(Tables.documents(s, d)),
      blockedDomains = RowBlockedDomains,
      blockedWords = RowBlockedWords,
      maxLen = RowMaxLen),
    Some {
      val twoLevel = DefaultTwoLevelTlds.map(_.replace(".", "\\."))
        .mkString("""\.(""", "|", ")$")
      val domList = RowBlockedDomains.map(sqlQ).mkString(", ")
      val schemeList = DefaultAllowedSchemes.map(sqlQ).mkString(", ")
      val wordCond = RowBlockedWords
        .map(w => s"contains(lurl, ${sqlQ(w)})").mkString(" OR ")
      s"""WITH ${sqlUrlsCte("documents")},
      parsed AS (SELECT doc_id, url, lower(url) AS lurl,
        regexp_extract(lurl, ${sqlQ(SchemeRe)}, 1) AS scheme,
        regexp_extract(lurl, ${sqlQ(HostRe)}, 1) AS host,
        CASE WHEN regexp_matches(host, ${sqlQ(IpHostRe)}) THEN host
             ELSE coalesce(
               CASE WHEN regexp_matches(host, ${sqlQ(twoLevel)})
                 THEN nullif(regexp_extract(host, ${sqlQ(Dom3Re)}, 1), '')
                 END,
               nullif(regexp_extract(host, ${sqlQ(Dom2Re)}, 1), ''),
               host) END AS domain
        FROM urls),
      flags AS (SELECT doc_id, url, scheme, host, domain,
        CAST(CASE WHEN scheme NOT IN ($schemeList) THEN 1 ELSE 0 END AS BIGINT) AS bad_scheme,
        CAST(CASE WHEN regexp_matches(host, ${sqlQ(IpHostRe)}) THEN 1 ELSE 0 END AS BIGINT) AS ip_host,
        CAST(CASE WHEN domain IN ($domList) THEN 1 ELSE 0 END AS BIGINT) AS blocked_domain,
        CAST(CASE WHEN $wordCond THEN 1 ELSE 0 END AS BIGINT) AS blocked_word,
        CAST(CASE WHEN length(url) > $RowMaxLen THEN 1 ELSE 0 END AS BIGINT) AS too_long
        FROM parsed)
      SELECT doc_id, url, scheme, host, domain, bad_scheme, ip_host,
        blocked_domain, blocked_word, too_long,
        CAST(CASE WHEN bad_scheme + ip_host + blocked_domain +
          blocked_word + too_long = 0 THEN 1 ELSE 0 END AS BIGINT) AS kept
      FROM flags ORDER BY doc_id"""
    })

  val all: Seq[Q] = Seq(qUrlFilter)
}
