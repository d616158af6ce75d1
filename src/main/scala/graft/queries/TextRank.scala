package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C24 — TextRank keyword extraction (Mihalcea & Tarau EMNLP'04):
  * corpus-level keywords by PageRank over the word CO-OCCURRENCE graph
  * — the graph-centrality complement to C12's PMI collocations (PMI
  * scores PAIR surprise; TextRank scores WORD importance through the
  * whole graph's structure, the difference that finds hub terms no
  * single pair makes conspicuous). Words are graph nodes; an
  * undirected edge joins words co-occurring within `window` positions
  * in any document; ranks come from the SAME integer fixed-point
  * PageRank every graph row uses ([[graft.ops.PageRank]]) — exact,
  * order-independent, oracle-replayable (the D11 chain, shared via
  * `GraphRank.sqlPageRankChain` so the two oracles cannot drift).
  *
  * Scale shape: positions join within a doc-keyed co-partitioned
  * self-join (residual on the position window — the G8 pattern), edges
  * distinct on word-id pairs, then the PageRank rounds on a
  * vocabulary-sized graph. The word→id map is the H10 distributed
  * prefix sum over the distinct vocabulary (range exchange + counting
  * + broadcast offsets — no single-partition sort anywhere: the
  * vocabulary grows with the corpus, unlike the bounded key spaces
  * the I3/I8 windows ride). Output: the top `k` terms by rank,
  * integer micro-rank units.
  */
object TextRank {

  val Iters = 5

  /** Default co-occurrence window — referenced by BOTH the Scala
    * signature and the interpolated oracle SQL (the `Iters` pattern), so
    * changing the default cannot silently desync query and oracle. */
  val WindowDefault = 2

  /** Default top-k — shared by the signature and the oracle's LIMIT. */
  val KDefault = 50

  def textRank(
      docs: DataFrame,
      window: Int = WindowDefault,
      iterations: Int = Iters,
      k: Int = KDefault): DataFrame = {
    require(window >= 1 && k >= 1 && iterations >= 1,
      "window, k, iterations must be positive")
    // widenScan before the tokenize+posexplode map (guide §2.5)
    val toks = graft.ops.ScaleOps.widenScan(docs, "doc_id")
      .select(col("doc_id"), posexplode(words(col("text"))).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    // dense ids via the H10 distributed prefix sum (range exchange +
    // per-partition counting + broadcast offsets), NOT a row_number
    // over an unpartitioned window: unlike the other global windows
    // here (all parameter- or histogram-bounded), the distinct
    // vocabulary GROWS with the corpus (~10^8+ grams at 100×) and a
    // single-partition sort over it is the one task the plan cannot
    // widen (r13 verdict). Ids are identical to the oracle's
    // row_number() OVER (ORDER BY w) - 1 — the window IS the oracle.
    val vocab = graft.ops.ScaleOps.prefixSum(
        toks.select(col("w")).distinct().withColumn("one", lit(1L)),
        "w", "one", "wid")
      .select(col("w"), (col("wid") - 1L).as("wid"))
    // ids attach to the token stream BEFORE the positional self-join
    // (one vocab join on |toks| rows instead of two on the pair set,
    // and the self-join shuffles 8-byte ids, not strings — guide §2.3;
    // vocab is injective, so wid inequality ⇔ word inequality and the
    // pair set is unchanged)
    val toksId = toks.join(vocab, Seq("w"))
      .select(col("doc_id"), col("pos"), col("wid"))
    val a = toksId.select(col("doc_id"), col("pos").as("pa"), col("wid").as("src"))
    val b = toksId.select(col("doc_id"), col("pos").as("pb"), col("wid").as("dst"))
    val pairs = a.join(b, Seq("doc_id"))
      .filter(col("pb") > col("pa") && col("pb") <= col("pa") + window &&
        col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
    val e = pairs.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    val ranked = graft.ops.PageRank.pageRank(e, iterations = iterations)
    ranked.join(vocab, ranked("node") === vocab("wid"))
      .select(col("w").as("term"), col("rank"))
      .orderBy(col("rank").desc, col("term"))
      .limit(k)
  }

  val qTextRank: Q = Q(
    "q_textrank",
    (s, d) => textRank(Tables.documents(s, d)),
    Some {
      val ws = sqlWords("text")
      // MATERIALIZED on the leaves: the PageRank chain references `e`
      // once per iteration and DuckDB's default inlining would re-run
      // the positional self-join each time (the D24 lesson — this
      // oracle timed out at sf0.1 without the hints; q_pagerank's `e`
      // survives un-hinted only because its lineage is one cheap
      // distinct)
      s"""WITH toks AS MATERIALIZED (
        SELECT doc_id, CAST(generate_subscripts(wl, 1) AS BIGINT) AS pos,
          unnest(wl) AS w
        FROM (SELECT doc_id, list_filter($ws, t -> t <> '') AS wl
          FROM documents) src),
      vocab AS MATERIALIZED (SELECT w,
          CAST(row_number() OVER (ORDER BY w) - 1 AS BIGINT) AS wid
        FROM (SELECT DISTINCT w FROM toks) dw),
      pairs AS MATERIALIZED (SELECT DISTINCT va.wid AS s, vb.wid AS d
        FROM toks a JOIN toks b ON a.doc_id = b.doc_id
          AND b.pos > a.pos AND b.pos <= a.pos + $WindowDefault AND a.w <> b.w
        JOIN vocab va ON va.w = a.w
        JOIN vocab vb ON vb.w = b.w),
      e AS MATERIALIZED (SELECT s, d FROM pairs UNION SELECT d, s FROM pairs),
      ${GraphRank.sqlPageRankChain(Iters)}
      SELECT v.w AS term, CAST(i.rank AS BIGINT) AS rank
      FROM it$Iters i JOIN vocab v ON i.node = v.wid
      ORDER BY rank DESC, term LIMIT $KDefault"""
    })

  val all: Seq[Q] = Seq(qTextRank)
}
