package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D27 — INCREMENTAL span-granularity dedup: the nightly-crawl flow
  * D13/D13b cover at DOC granularity, at ExactSubstr granularity
  * (Lee '22) — audit ([[dupSpansIncremental]]) and rewrite
  * ([[exciseSpansIncremental]]) of an incoming batch against an
  * accumulated lake WITHOUT re-running D14/D16 over lake text.
  *
  * The lake's span-dedup state is its GRAM-KEY artifact
  * ([[gramKeyFrame]], stored via
  * [[graft.sources.Sinks.appendGramKeys]]): per distinct word-n-gram
  * md5, the lake-global FIRST occurrence as the D16 packed key
  * `doc_id·2^31 + p` — ~24 B/gram of decision state (16-byte key +
  * 8-byte keeper), NEVER text. That is sufficient state for EXACT
  * equivalence with the full-corpus operators on the batch:
  *
  *  - audit: a batch position is span-covered iff its gram's UNION
  *    count >= 2, i.e. the gram is in the lake at all (count >= 1
  *    there) OR occurs >= 2 times within the batch — presence + a
  *    batch-local count, no lake counts needed;
  *  - rewrite: D16's keeper is the union-global min packed occurrence
  *    = min(lake keeper, batch keeper) — the stored keeper makes this
  *    exact under ANY id interleaving (no "later batches must get
  *    larger ids" ordering contract needed; only id DISJOINTNESS,
  *    enforced like D13b's clash guard).
  *
  * Both oracles are the FULL D14/D16 SQL over the union filtered to
  * batch docs (the D13b losslessness pattern): hash-green proves the
  * restricted incremental computation loses nothing vs re-running the
  * whole corpus.
  *
  * Scale shape — the reason this operator exists: candidate generation
  * joins ONLY batch-side gram keys against the key store (batch
  * distinct-h semi-probe; the lake never self-pairs), the batch count
  * and keeper are batch-local aggs, and the rebuild tail is
  * [[Dedup.exciseRebuild]] over batch docs only — so per-night cost
  * scales with the BATCH (× one narrow key-equi probe of the store:
  * 24-byte rows, bucketable by h on disk so the probe co-locates),
  * not with lake text. The incremental contract: the batch is
  * audited/rewritten against the lake; the lake itself is never
  * rewritten (earlier occurrences won — the D13 orientation).
  */
object SpanIncremental {

  /** Batch gram frames feed two consumers (count/keeper agg + the
    * position paint), so memo the explode+md5 pass per batch plan. */
  private[this] val gramCache = new graft.ops.PlanCache(capacity = 2)

  /** (doc_id, p, h): 1-based gram positions keyed on md5 — the D14
    * 128-bit decision-key rule (a poly-hash key birthday-collides into
    * phantom spans at corpus scale; md5 does not). */
  private def gramFrame(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"),
        posexplode_outer(shingles(words(col("text")), n))
          .as(Seq("p0", "g")))
      .filter(col("g").isNotNull)
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"),
        md5(col("g")).as("h"))

  /** D16's packed occurrence key with its domain guard: doc_id·2^31+p,
    * enforced (not just documented) exactly as exciseSpans does. */
  private def packedOcc(grams: DataFrame): DataFrame = {
    val domainOk =
      col("doc_id").between(0L, (1L << 32) - 1) && col("p") < (1L << 31)
    grams.withColumn("occ",
      col("doc_id") * (1L << 31) + col("p") +
        coalesce(assert_true(domainOk,
          lit("spanIncremental: doc_id outside [0, 2^32) or p >= 2^31 — " +
            "packed keeper key would overflow")).cast("long"), lit(0L)))
  }

  /** The lake's gram-key artifact: (h, keeper) — one row per distinct
    * word-`n`-gram, keeper = the lake-global first occurrence as the
    * packed key. THIS is what a production lake stores
    * ([[graft.sources.Sinks.appendGramKeys]]) so nightly batches
    * never rescan lake text; an append-only store may carry one row
    * per h per appended batch — [[lakeKeys]] re-merges by min. */
  def gramKeyFrame(docs: DataFrame, n: Int = Dedup.DupSpanN): DataFrame =
    packedOcc(gramFrame(docs, n))
      .groupBy("h").agg(min(col("occ")).as("keeper"))

  /** Normalize the lake argument: a raw (doc_id, text) frame pays the
    * gram pass (what the oracle rows do — end-to-end checkable), a
    * precomputed (h, keeper) store is merged by min across its
    * appended generations. */
  private def lakeKeys(lake: DataFrame, n: Int): DataFrame =
    if (lake.columns.contains("text")) gramKeyFrame(lake, n)
    else lake.groupBy("h").agg(min(col("keeper")).as("keeper"))

  /** D27 audit — [[Dedup.dupSpans]] of the incoming batch against
    * lake ∪ batch: per batch doc, the maximal token intervals covered
    * by grams duplicated in the UNION (in the lake at all, or >= 2
    * times within the batch). Output (doc_id, span_start, span_end,
    * n_dup_grams) for batch docs only — identical to full D14 over
    * the union restricted to batch docs (the oracle proves it). */
  def dupSpansIncremental(
      incoming: DataFrame,
      lake: DataFrame,
      n: Int = Dedup.DupSpanN): DataFrame = {
    require(n >= 1, s"n-gram length must be >= 1, got $n")
    val bg = gramCache.memo(gramFrame(incoming, n))
    // only batch-side keys probe the store (narrow semi-join on h);
    // the lake never pairs with itself
    val knownH = bg.select("h").distinct()
      .join(lakeKeys(lake, n).select("h"), Seq("h"), "left_semi")
    val batchDupH = bg.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("h")
    val dupH = knownH.unionByName(batchDupH).distinct()
    Dedup.mergeGramSpans(
        bg.join(dupH, "h").select(col("doc_id"), col("p")), n)
      .withColumnRenamed("n_grams", "n_dup_grams")
      .orderBy("doc_id", "span_start")
  }

  /** D27 rewrite — [[Dedup.exciseSpans]] of the incoming batch against
    * lake ∪ batch: every batch token covered by a duplicated-gram
    * occurrence that is not the union-global keeper is removed and the
    * doc reassembled ((doc_id, n_tokens, n_excised, text_clean) for
    * EVERY batch doc). keeper(h) = min(lake keeper, batch keeper) —
    * exact D16 semantics under any id interleaving; the lake's own
    * occurrences are never rewritten (the incremental contract).
    * Requires batch/lake doc_ids disjoint when the lake carries ids
    * (enforced — the D13b clash-guard pattern; a key-frame lake has
    * no ids and its construction is the contract). */
  def exciseSpansIncremental(
      incoming: DataFrame,
      lake: DataFrame,
      n: Int = Dedup.DupSpanN): DataFrame = {
    require(n >= 1, s"n-gram length must be >= 1, got $n")
    val packed = packedOcc(gramCache.memo(gramFrame(incoming, n)))
    val bstats = packed.groupBy("h")
      .agg(count(lit(1)).as("c"), min(col("occ")).as("bkeeper"))
    val merged = bstats
      .join(lakeKeys(lake, n).withColumnRenamed("keeper", "lkeeper"),
        Seq("h"), "left")
      .select(col("h"), col("c"),
        when(col("lkeeper").isNotNull,
          least(col("lkeeper"), col("bkeeper")))
          .otherwise(col("bkeeper")).as("gkeeper"),
        col("lkeeper").isNotNull.as("in_lake"))
    val nonKeeper = packed.join(merged, "h")
      .filter((col("in_lake") || col("c") >= 2) &&
        col("occ") =!= col("gkeeper"))
      .select(col("doc_id"), col("p"))
    val out = Dedup.exciseRebuild(incoming, nonKeeper, n)
    if (!lake.columns.contains("doc_id")) out
    else {
      // id-disjointness guard (the D13b pattern): an id present in
      // both frames would put two texts under one identity and
      // silently corrupt keeper arithmetic. Folded into EVERY output
      // column (guardL is 0L on the clean path; the string arm is a
      // zero-length substring), so no projection — doc_id-only,
      // text_clean-only — lets Catalyst prune the assert away (a
      // round-14 advisor finding: the n_excised-only fold was
      // prunable by any consumer that didn't read the counts).
      val clash = incoming.select(col("doc_id"))
        .join(lake.select(col("doc_id")), Seq("doc_id"))
        .agg(count(lit(1)).as("__clash"))
      val guardL = coalesce(assert_true(col("__clash") === 0,
        lit("exciseSpansIncremental: incoming and lake doc_ids must be disjoint"))
        .cast("long"), lit(0L))
      val guardS = substring(guardL.cast("string"), 0, 0)
      out.crossJoin(clash)
        .select((col("doc_id") + guardL).as("doc_id"),
          (col("n_tokens") + guardL).as("n_tokens"),
          (col("n_excised") + guardL).as("n_excised"),
          concat(col("text_clean"), guardS).as("text_clean"))
    }
  }

  /** Oracle split: docs with doc_id ≡ 0 (mod 3) play the lake, the
    * rest arrive as the batch — ids interleave, exercising the keeper
    * arithmetic the ordering-free contract promises. Oracle = the FULL
    * D14 span pipeline over all documents, filtered to batch docs. */
  val qDupSpansIncremental: Q = Q(
    "q_dup_spans_incremental",
    (s, d) => {
      val docs = Tables.documents(s, d)
      dupSpansIncremental(
        docs.filter(col("doc_id") % 3 =!= 0),
        docs.filter(col("doc_id") % 3 === 0))
    },
    Some(s"""WITH ${Dedup.sqlDupSpanCtes("documents")}
      SELECT doc_id, min(p) AS span_start,
        max(p) + ${Dedup.DupSpanN - 1} AS span_end,
        count(*) AS n_dup_grams
      FROM j WHERE doc_id % 3 <> 0
      GROUP BY doc_id, grp
      ORDER BY doc_id, span_start"""))

  /** Same split; oracle = the FULL D16 excision chain over all
    * documents, filtered to batch docs — hash-green proves the
    * restricted join + stored-keeper arithmetic equals rewriting
    * against the whole corpus. */
  val qExciseSpansIncremental: Q = Q(
    "q_excise_spans_incremental",
    (s, d) => {
      val docs = Tables.documents(s, d)
      exciseSpansIncremental(
        docs.filter(col("doc_id") % 3 =!= 0),
        docs.filter(col("doc_id") % 3 === 0))
    },
    Some(s"""WITH ${Dedup.sqlExciseCtes("documents")}
      SELECT doc_id, n_tokens, n_excised, text_clean
      FROM xout WHERE doc_id % 3 <> 0
      ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(qDupSpansIncremental, qExciseSpansIncremental)
}
