package graft.queries

import graft.Q
import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D21 — ExactSubstr duplicate spans by SUFFIX-ARRAY RANK DOUBLING
  * (Lee et al. ACL'22's actual formulation, re-expressed relationally).
  *
  * [[Dedup.dupSpansChar]] (D14b) decides "this char-`k`-gram occurs
  * >= 2x" by grouping on the gram's md5 — collision-free *in practice*
  * (128-bit keys), but still a probabilistic decision key, and each
  * shuffled row carries 16 hash bytes. This operator reaches the
  * IDENTICAL output with no hashing anywhere: it builds the corpus's
  * suffix ranks by prefix doubling — the Manber–Myers construction,
  * each round expressed as two windows — and reads "duplicated" off
  * the final rank groups by exact symbol comparison. Exact by
  * construction at any corpus size; the oracle row reuses D14b's
  * DuckDB SQL verbatim, so the hash-green result doubles as a
  * differential proof that the two algorithms agree gram-for-gram
  * (the D4b losslessness pattern, applied across algorithms).
  *
  * Rank construction (per round, prefix length `h` -> `h + shift`):
  *   1. `r2 = lead(r, shift) over (partition by doc_id order by p)` —
  *      suffixes never cross document boundaries (the separator in the
  *      concatenated-corpus formulation), so the pair lookup is a
  *      per-doc window, null past the doc end -> sentinel -1.
  *   2. `r' = min(gid) over (partition by r, r2)` where
  *      `gid = doc_id * 2^20 + p` is the position's unique global id.
  * Min-gid ranks are INJECTIVE per group (disjoint groups of unique
  * gids have distinct minima), so rank equality <=> same group <=>
  * the prefixes compare equal symbol-by-symbol, inductively down to
  * the base-pack ranks — never "probably equal". Dense re-ranking
  * (the textbook presentation) would need a global running number;
  * min-gid needs only a map-side-combinable `min` and keeps every
  * round a plain 16-byte-key window. The last round uses
  * `shift = k - h` (overlapping windows — equality of `[p, p+h-1]`
  * and `[p+k-h, p+k-1]` covers all `k` chars once `h >= k/2`, the
  * sparse-table LCP trick), and computes `count(*)` over the same
  * partition instead of a new rank: a position starts a duplicated
  * `k`-gram iff its final group has >= 2 members. Span merging is the
  * shared [[Dedup.mergeGramSpans]], so output shape and semantics are
  * exactly D14b's: disjoint maximal `[span_start, span_end]` char
  * intervals, 1-based inclusive, `n_dup_grams` merged starts.
  *
  * Sentinel safety: real ranks are >= 1 (printable-ASCII base, gid >= 1
  * minima), so -1 never aliases one; a suffix shorter than its window
  * hits a sentinel at some doubling level (positions past the doc end
  * do not exist), which puts short suffixes in their own groups — the
  * final `p <= len - k + 1` filter then drops them from output.
  *
  * Scale shape vs D14b: doubling starts from the 7-char base pack
  * (rank_7 computed in the base map — 7 ASCII chars in base 128 fit
  * one long, injective on content with no window), so k = 20 is TWO
  * rounds (7 → 14 → 20) and k = 50 three, each round two shuffles of
  * (long, long, long) rows — ~24 B/char integer traffic per round vs
  * the hash form's single 16 B/char shuffle; k <= 7 needs no doubling
  * at all (one count window on the pack). At 100 TB each round is a
  * Terasort-shaped integer sort, the best-understood distributed
  * primitive; nothing is persisted across rounds, and the base pack's
  * groups hash-spread fine because the per-group aggregate is a
  * combinable min/count, not a sort-rank.
  * Stopping at prefix length `k` matches D14b's fixed-threshold
  * semantics; the full Lee '22 suffix array doubles to max doc length
  * (log L rounds) to expose maximal duplicates at EVERY length — the
  * same loop, more rounds. The md5 form (one shuffle) remains the
  * cheap path; this is the exact one, and the cross-check that the
  * cheap path's "collision-free in practice" holds on this corpus.
  */
object SuffixDedup {

  /** Packing domain for `gid = doc_id * 2^20 + p`: doc ids below
    * 2^43, docs below 2^20 chars (1 MiB). Enforced in-plan. */
  private val PosBits = 20

  /** Base-rank width: the first `BaseChars` chars of every suffix pack
    * into ONE long (ASCII < 128, so base 128: 128^7 = 2^49), giving
    * rank_7 directly in the base map — injective on CONTENT, not just
    * group-consistent, with no window at all. Doubling then starts at
    * h = 7 instead of h = 1, cutting k = 20 from five rounds to two
    * (7 → 14 → 20) and k = 50 to three (7 → 14 → 28 → 50). Past-end
    * chars pack as 0 (`ascii('')`), below every real ASCII value, so
    * short-suffix packs can never alias a full window's. */
  private val BaseChars = 7

  def dupSpansSuffix(docs: DataFrame, k: Int = 50): DataFrame = {
    require(k >= 2, s"char-gram length must be >= 2, got $k")
    val txt = coalesce(col("text"), lit(""))
    val lenC = length(txt).cast("long")
    // the base-128 pack is injective only for ASCII text (ascii() of a
    // non-ASCII char is its codepoint >= 128, so distinct windows can
    // alias one long) — enforce it rather than corrupt silently:
    // byte length == char length iff every char is single-byte ASCII
    val domainOk =
      col("doc_id").between(0L, (1L << (63 - PosBits)) - 1) &&
        col("len") < (1L << PosBits) &&
        octet_length(col("text")).cast("long") === col("len")
    val base = math.min(BaseChars, k)
    // big-endian base-128 pack of chars [p, p + base - 1]
    def pack: Column = (0 until base)
      .map(j => ascii(col("text").substr(col("p") + j, lit(1))).cast("long") *
        math.pow(128, base - 1 - j).toLong)
      .reduce(_ + _)
    // one row per character; the in-plan guard rides the base rank so
    // column pruning cannot drop it (every later column derives from r)
    val chars = docs
      .select(col("doc_id"), txt.as("text"), lenC.as("len"))
      .select(col("doc_id"), col("text"), col("len"),
        explode_outer(when(col("len") >= 1L, sequence(lit(1L), col("len")))
          .otherwise(array())).as("p"))
      .filter(col("p").isNotNull)
      .select(col("doc_id"), col("p"), col("len"),
        (pack + coalesce(assert_true(domainOk,
          lit(s"dupSpansSuffix: doc_id >= 2^${63 - PosBits}, doc longer " +
            s"than 2^$PosBits chars, or non-ASCII text — gid/base-128 " +
            "packing would overflow or alias (use the md5 form for " +
            "non-ASCII corpora)"))
          .cast("long"), lit(0L))).as("r"))

    val gid = col("doc_id") * (1L << PosBits) + col("p")
    var cur = chars
    var h = base
    var dupPos: DataFrame =
      if (h >= k)
        // k <= 7: the base pack IS rank_k — one count window, done
        cur.withColumn("c", count(lit(1)).over(Window.partitionBy("r")))
          .filter(col("c") >= 2 && col("p") <= col("len") - (k - 1))
          .select(col("doc_id"), col("p"))
      else null
    while (h < k) {
      val shift = math.min(h, k - h)
      val paired = cur.withColumn("r2",
        coalesce(lead(col("r"), shift)
          .over(Window.partitionBy("doc_id").orderBy("p")), lit(-1L)))
      val wg = Window.partitionBy("r", "r2")
      if (h + shift >= k) {
        dupPos = paired
          .withColumn("c", count(lit(1)).over(wg))
          .filter(col("c") >= 2 && col("p") <= col("len") - (k - 1))
          .select(col("doc_id"), col("p"))
      } else {
        cur = paired
          .withColumn("nr", min(gid).over(wg))
          .select(col("doc_id"), col("p"), col("len"), col("nr").as("r"))
      }
      h += shift
    }
    Dedup.mergeGramSpans(dupPos, k)
      .withColumnRenamed("n_grams", "n_dup_grams")
      .orderBy("doc_id", "span_start")
  }

  /** Oracle = D14b's SQL verbatim (same k): hash-green means the
    * suffix-rank and md5-gram algorithms agree on every span. */
  val qDupSpansSuffix: Q = Q(
    "q_dup_spans_sa",
    (s, d) => dupSpansSuffix(Tables.documents(s, d), Dedup.DupSpanCharK),
    Dedup.qDupSpansChar.oracle)

  val all: Seq[Q] = Seq(qDupSpansSuffix)
}
