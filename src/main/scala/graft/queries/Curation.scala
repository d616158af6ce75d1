package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed "clean my crawl" pipeline a
  * training-data user actually runs, chaining the individually
  * oracle-checked stages: quality gate → exact dedup → near-dup drop.
  * One lazy plan; each stage's scale shape is documented on its own
  * operator (quality is a map stage, both dedups shuffle 8-byte hashes,
  * never text).
  */
object Curation {

  /** Memo of the exact-dedup survivor stage used twice inside
    * [[curateClusters]] (see [[graft.ops.PlanCache]]). */
  private[this] val survivorCache = new graft.ops.PlanCache(capacity = 2)

  /** Clean `docs` (doc_id, text, …): keep docs with
    * `quality_score >= minQuality`, then drop exact duplicates (min
    * doc_id survives), then — when `dropNearDups` — drop the larger id
    * of every MinHash near-dup pair (greedy keep-smallest; applied to
    * the already-exact-deduped corpus, so chains collapse toward their
    * smallest member pairwise, without a connected-components pass).
    * Returns the surviving rows of `docs` plus their `quality_score`.
    *
    * Plan shape: the exact-dedup stage ([[Dedup.exactSurvivors]])
    * windows over a narrow (doc_id, hashes) projection and semi-joins
    * the survivors back, so no stage ever shuffles document text —
    * only 8–40-byte keys. With `dropNearDups` the survivor frame feeds
    * BOTH the pair generation and the anti-join left side, so it is
    * memo-persisted ([[graft.ops.PlanCache]]) — the quality+window
    * chain over the corpus runs once, not once per branch. The persist
    * is itself lazy (nothing executes until an action; the first
    * branch evaluated populates the cache for the other). */
  /** @param maxRepRatio additionally drop docs whose most-repeated word
    *        2-gram exceeds this fraction of all 2-grams
    *        ([[TextAnalysis.repetitionStats]]'s `rep_ratio` — the
    *        "spam spam spam" gate). 1.0 (default) disables the gate. */
  def curate(
      docs: DataFrame,
      minQuality: Double = 0.3,
      dropNearDups: Boolean = true,
      maxRepRatio: Double = 1.0): DataFrame = {
    val quality = TextAnalysis.qualityScores(docs)
      .select(col("doc_id"), col("quality_score"))
    val gated =
      if (maxRepRatio >= 1.0) docs
      else docs.join(
        TextAnalysis.repetitionStats(docs)
          .filter(col("rep_ratio") <= maxRepRatio).select("doc_id"),
        Seq("doc_id"), "left_semi")
    val survivors = Dedup.exactSurvivors(
      gated.join(quality, "doc_id")
        .filter(col("quality_score") >= minQuality))
    if (!dropNearDups) survivors
    else {
      val afterExact = survivorCache.memo(survivors)
      val nearDrop = Dedup.minhashPairs(afterExact)
        .select(col("id_b").as("doc_id")).distinct()
      afterExact.join(nearDrop, Seq("doc_id"), "left_anti")
    }
  }

  /** [[curate]] with CLUSTER-based near-dup dropping: MinHash pairs over
    * the exact-dedup survivors are closed transitively
    * ([[graft.ops.ConnectedComponents]]) and only each cluster's
    * minimum doc_id survives. Strictly more principled than the greedy
    * pairwise drop: in a cluster {3,5,9} whose pairs are (5,9) and
    * (3,9), greedy keeps BOTH 3 and 5 (5 never appears as the larger
    * id of a pair), while the cluster form keeps only 3.
    *
    * Note: the connected-components iteration runs Spark jobs when this
    * function is CALLED (it converges by fixpoint), unlike the fully
    * lazy [[curate]]. */
  def curateClusters(
      docs: DataFrame,
      minQuality: Double = 0.3,
      maxRepRatio: Double = 1.0): DataFrame = {
    // memoized-persisted: the survivor frame feeds BOTH the pair
    // generation (materialized eagerly inside the CC iteration) and the
    // final anti-join — without it the whole quality+window-dedup chain
    // runs twice. This function is already eager (the CC fixpoint runs
    // jobs on call), so the persist doesn't change laziness; the
    // plan-keyed memo means repeat calls over the same corpus share one
    // cache entry instead of leaking one per call.
    val afterExact = survivorCache.memo(
      curate(docs, minQuality, dropNearDups = false, maxRepRatio))
    val pairs = Dedup.minhashPairs(afterExact).select(col("id_a"), col("id_b"))
    val labels = graft.ops.ConnectedComponents
      .connectedComponents(pairs, "id_a", "id_b")
    val drop = labels.filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))
    afterExact.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Same oracle chain as [[qCurate]] but the near-dup drop is the
    * recursive-CTE transitive closure over the survivor pair set — the
    * losslessness check for composing D7 into the pipeline. */
  val qCurateCc: Q = Q(
    "q_curate_cc",
    (s, d) => curateClusters(Tables.documents(s, d))
      .select(col("doc_id"), col("source"), col("quality_score"))
      .orderBy("doc_id"),
    Some(s"""WITH RECURSIVE ${TextAnalysis.sqlQualityCte("documents")},
      qualified AS (
        SELECT d.doc_id, d.text, d.source, q.quality_score
        FROM documents d JOIN q_scores q USING (doc_id)
        WHERE q.quality_score >= 0.3),
      keyed AS (
        SELECT *, md5(${sqlNormText("text")}) AS k1,
               ${sqlPolyHash(sqlNormText("text"))} AS k2
        FROM qualified),
      surv AS (
        SELECT doc_id, text, source, quality_score FROM (
          SELECT *, min(doc_id) OVER (PARTITION BY k1, k2) AS m FROM keyed) t
        WHERE doc_id = m),
      ${Dedup.sqlMinhashPairCtes("surv")},
      sym AS (
        SELECT id_a AS u, id_b AS v FROM mh_pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM mh_pairs),
      reach AS (
        SELECT doc_id AS u, doc_id AS v FROM surv
        UNION
        SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
      lab AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u)
      SELECT s.doc_id, s.source, s.quality_score
      FROM surv s JOIN lab l USING (doc_id)
      WHERE l.doc_id = l.component
      ORDER BY s.doc_id"""))

  /** The COMPOSED pipeline oracle-checked end-to-end: the DuckDB side
    * chains the same stage fragments (quality CTE → exact-dup window →
    * MinHash pair CTEs over the survivors → anti-join), so a drift in
    * any stage OR in how they compose hash-mismatches. */
  val qCurate: Q = Q(
    "q_curate",
    (s, d) => curate(Tables.documents(s, d))
      .select(col("doc_id"), col("source"), col("quality_score"))
      .orderBy("doc_id"),
    Some(s"""WITH ${TextAnalysis.sqlQualityCte("documents")},
      qualified AS (
        SELECT d.doc_id, d.text, d.source, q.quality_score
        FROM documents d JOIN q_scores q USING (doc_id)
        WHERE q.quality_score >= 0.3),
      keyed AS (
        SELECT *, md5(${sqlNormText("text")}) AS k1,
               ${sqlPolyHash(sqlNormText("text"))} AS k2
        FROM qualified),
      surv AS (
        SELECT doc_id, text, source, quality_score FROM (
          SELECT *, min(doc_id) OVER (PARTITION BY k1, k2) AS m FROM keyed) t
        WHERE doc_id = m),
      ${Dedup.sqlMinhashPairCtes("surv")}
      SELECT doc_id, source, quality_score FROM surv
      WHERE doc_id NOT IN (SELECT id_b FROM mh_pairs)
      ORDER BY doc_id"""))

  /** D17 — the MassiveWeb/Gopher pipeline STAGING AUDIT (Rae '21's
    * order: rule gates → repetition gates → dedup → decontamination)
    * as ONE declarative plan: per training doc, which stage takes it
    * out. The composed form of C16 + C17 + D1 + D9 — each stage's
    * semantics is exactly its standalone oracle-checked operator, and
    * the composed oracle reuses the SAME SQL fragment builders, so
    * pipeline and stages cannot drift.
    *
    * Output (doc_id, pass_rules, pass_rep, is_dup, contaminated, kept):
    *  - `pass_rules` — C16 gate (oracle-row params: minWords 10,
    *    corpus-bearing stop set);
    *  - `pass_rep` — C17 repetition gate (paper thresholds);
    *  - `is_dup` — among docs passing BOTH gates, 1 unless the doc is
    *    the min-doc_id owner of its D1 content-key group. Dedup runs
    *    AFTER gating, as the paper stages it: a gated-out doc never
    *    shields a kept duplicate (docs failing the gates report 0 —
    *    the stage never saw them);
    *  - `contaminated` — the D9 flag vs the eval frame, unconditional
    *    (a leak is a leak whatever the earlier stages decided);
    *  - `kept` — passes all four.
    *
    * Scale shape: both gates are shuffle-free map stages; the dedup
    * window partitions on 24-byte content keys of the GATED subset
    * only; contamination is the broadcast-eval probe; the final
    * assembly joins doc_id-keyed flag frames — text never shuffles. */
  /** @param minWords C16 gate floor — PAPER default (50), like
    *        `gopherRules`; the oracle row passes 10 + the
    *        corpus-bearing stop set (the C16 oracle-row settings), so
    *        the gates discriminate on the synthetic corpus.
    * @param stops C16 stopword-presence set, paper default. */
  def pipelineAudit(docs: DataFrame, eval: DataFrame,
      minWords: Long = 50L,
      stops: Seq[String] = TextAnalysis.GopherStops): DataFrame = {
    // ONE evaluation of both gate map stages: the flags frame feeds
    // the gated-subset filter AND the final flag join — memo-persisted
    // so the regex tokenization + native kernels run once per doc, not
    // once per referencing branch
    val flags = pipeFlagCache.memo(
      TextAnalysis.gopherFlags(docs, minWords, 100000L, stops)
        .select(col("doc_id"), col("kept").as("pass_rules"))
        .join(TextAnalysis.gopherRepFlags(docs)
          .select(col("doc_id"), col("kept").as("pass_rep")), "doc_id"))
    // dedup = THE D1 operator over the gated sub-corpus (content keys
    // computed only for docs the gates admit): any future change to
    // D1's survivor rule flows through here by construction
    val gatedDocs = docs.join(
      flags.filter(col("pass_rules") === 1L && col("pass_rep") === 1L)
        .select("doc_id"),
      Seq("doc_id"), "left_semi")
    val dupFlag = Dedup.exactDuplicates(gatedDocs)
      .select(col("doc_id"), col("is_dup").cast("long").as("is_dup"))
    val contam = Contamination.decontaminate(docs, eval)
      .select(col("doc_id"), col("contaminated"))
    flags
      .join(dupFlag, Seq("doc_id"), "left")
      .join(contam, "doc_id")
      .select(col("doc_id"), col("pass_rules"), col("pass_rep"),
        coalesce(col("is_dup"), lit(0L)).as("is_dup"),
        col("contaminated"),
        when(col("pass_rules") === 1L && col("pass_rep") === 1L &&
          coalesce(col("is_dup"), lit(0L)) === 0L &&
          col("contaminated") === 0L, 1L).otherwise(0L).as("kept"))
      .orderBy("doc_id")
  }

  /** Memo of [[pipelineAudit]]'s gate-flags frame (see
    * [[graft.ops.PlanCache]]; released by [[graft.ops.Release]]). */
  private[this] val pipeFlagCache = new graft.ops.PlanCache(capacity = 2)

  val qPipelineAudit: Q = Q(
    "q_pipeline_audit",
    (s, d) => {
      val docs = Tables.documents(s, d)
      pipelineAudit(
        docs.filter(col("doc_id") % Contamination.EvalMod =!= 0),
        docs.filter(col("doc_id") % Contamination.EvalMod === 0),
        minWords = 10L, stops = TextAnalysis.CorpusStops)
    },
    Some {
      val train =
        s"(SELECT * FROM documents WHERE doc_id % ${Contamination.EvalMod} <> 0)"
      val k = Contamination.NgramK
      s"""WITH ${TextAnalysis.sqlGopherCountsCte(train)},
      ${TextAnalysis.sqlGopherRepCtes(train)},
      rules AS (SELECT doc_id,
          CAST(CASE WHEN ${TextAnalysis.sqlGopherKeptCond}
            THEN 1 ELSE 0 END AS BIGINT) AS pass_rules
        FROM gc),
      rep AS (SELECT doc_id,
          CAST(CASE WHEN ${TextAnalysis.sqlGopherRepKeptCond}
            THEN 1 ELSE 0 END AS BIGINT) AS pass_rep
        FROM rsel),
      pkeys AS (SELECT doc_id,
          md5(${sqlNormText("text")}) AS kk1,
          ${sqlPolyHash(sqlNormText("text"))} AS kk2
        FROM $train),
      gated AS (SELECT k.doc_id, kk1, kk2
        FROM pkeys k JOIN rules USING (doc_id) JOIN rep USING (doc_id)
        WHERE pass_rules = 1 AND pass_rep = 1),
      dupf AS (SELECT doc_id,
          CAST(CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY kk1, kk2)
            THEN 1 ELSE 0 END AS BIGINT) AS is_dup
        FROM gated),
      ptoks AS (SELECT doc_id,
          list_filter(${sqlWords("text")}, t -> t <> '') AS pw
        FROM documents),
      psh AS (SELECT doc_id,
          list_distinct(${sqlShingles("pw", k)}) AS sh FROM ptoks),
      peval AS (SELECT DISTINCT unnest(sh) AS s FROM psh
        WHERE doc_id % ${Contamination.EvalMod} = 0),
      pex AS (SELECT doc_id, unnest(sh) AS s FROM psh
        WHERE doc_id % ${Contamination.EvalMod} <> 0),
      phits AS (SELECT doc_id, count(*) AS n_hit
        FROM pex JOIN peval USING (s) GROUP BY 1),
      contam AS (SELECT t.doc_id,
          CAST(CASE WHEN COALESCE(h.n_hit, 0) > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS contaminated
        FROM psh t LEFT JOIN phits h USING (doc_id)
        WHERE t.doc_id % ${Contamination.EvalMod} <> 0)
      SELECT r.doc_id, pass_rules, pass_rep,
        CAST(COALESCE(is_dup, 0) AS BIGINT) AS is_dup, contaminated,
        CAST(CASE WHEN pass_rules = 1 AND pass_rep = 1
          AND COALESCE(is_dup, 0) = 0 AND contaminated = 0
          THEN 1 ELSE 0 END AS BIGINT) AS kept
      FROM rules r
        JOIN rep USING (doc_id)
        LEFT JOIN dupf USING (doc_id)
        JOIN contam USING (doc_id)
      ORDER BY r.doc_id"""
    })

  /** The CAPSTONE "corpus in, training shards out" pipeline — the
    * PRODUCING form of [[pipelineAudit]] (which only reports flags):
    * every stage an oracle-checked operator, composed as one
    * declarative plan:
    *
    *  1. gate screen — C16 rules ∧ C17 repetition (stateless maps);
    *  2. exact dedup — D1 survivors of the gated subset (min-doc_id);
    *  3. decontamination — D9's gate form drops eval leaks;
    *  4. ExactSubstr excision — D16 rewrites the SURVIVING sub-corpus
    *     (first occurrence keeps, later duplicated runs excised);
    *  5. epoch shuffle — H10's seeded order over the cleaned docs;
    *  6. BPE-weighted packing — H8b token counts of the CLEANED text
    *     under the frozen merge table, packed by the distributed
    *     prefix sum IN EPOCH ORDER (the loader's actual layout; the
    *     audit-family rows pack in doc_id order).
    *
    * Output, one row per produced doc: (doc_id, pos, n_tokens,
    * seq_first, seq_offset, n_seqs) — n_tokens is the BPE count of
    * the excised text, pos the epoch position, and the seq_* geometry
    * locates the doc inside the fixed-context training sequences.
    *
    * The DuckDB oracle chains the SAME fragment builders as the
    * standalone rows (C16/C17 count CTEs + kept conditions, the D16
    * excision chain, the H8b recursive-CTE encoder replay, H10's
    * scramble) — the D6/D17 technique, so no stage can drift from its
    * standalone oracle. Scale shape: gates are maps, dedup/decontam
    * shuffle keys, excision is D16's shape, the shuffle+packing tail
    * is two distributed prefix sums; the only text shuffles are D16's
    * reassembly groupBy and the word-keyed fertility join. */
  def pipelineProduce(docs: DataFrame, eval: DataFrame,
      minWords: Long = 50L,
      stops: Seq[String] = TextAnalysis.GopherStops,
      merges: Seq[((String, String), String)] = Tokenizer.FixedMerges,
      contextLen: Long = Shards.DefaultContextLen,
      seed: Long = 0L): DataFrame = {
    val (_, toks) = produceCore(docs, eval, minWords, stops, merges, seed)
    graft.ops.ScaleOps.prefixSum(toks, "pos", "n_tokens", "cum_tokens")
      .select(col("doc_id"), col("pos"), col("n_tokens"),
        expr(s"(cum_tokens - n_tokens) div $contextLen").as("seq_first"),
        expr(s"(cum_tokens - n_tokens) % $contextLen").as("seq_offset"),
        when(col("n_tokens") > 0,
          expr(s"(cum_tokens - 1) div $contextLen") -
            expr(s"(cum_tokens - n_tokens) div $contextLen") + 1)
          .otherwise(0L).as("n_seqs"))
      .orderBy("doc_id")
  }

  /** Stages 1–5 of [[pipelineProduce]] plus the BPE token counts — the
    * shared core, so [[pipelineProduce]] (sequence geometry) and
    * [[produceShards]] (artifact files) cannot drift: returns the
    * memo-persisted cleaned-text frame and the epoch-ordered
    * (doc_id, pos, n_tokens) frame. */
  private def produceCore(docs: DataFrame, eval: DataFrame,
      minWords: Long,
      stops: Seq[String],
      merges: Seq[((String, String), String)],
      seed: Long,
      byteTokens: Boolean = false): (DataFrame, DataFrame) = {
    import graft.functions.TextFunctions.words
    val gated = docs
      .join(TextAnalysis.gopherFlags(docs, minWords, 100000L, stops)
        .filter(col("kept") === 1L).select("doc_id"), Seq("doc_id"), "left_semi")
      .join(TextAnalysis.gopherRepFlags(docs)
        .filter(col("kept") === 1L).select("doc_id"), Seq("doc_id"), "left_semi")
    val clean = Contamination.decontamGate(Dedup.exactSurvivors(gated), eval)
    // memo-persisted: the cleaned-text frame feeds the epoch order,
    // the distinct-word encoder map, AND the fertility join — without
    // it the whole gate+dedup+decontam+excision chain runs per branch
    val cleanDocs = produceCache.memo(
      Dedup.exciseSpans(clean)
        .select(col("doc_id"), col("text_clean").as("text")))
    val ordered = Shards.shuffleOrder(cleanDocs, seed)
    // n_tokens under the chosen tokenizer: word-BPE counts (C13b) or
    // byte-fallback run counts (C28 — whitespace/punctuation priced as
    // real tokens, the H8c honest-budget arithmetic); either way the
    // encoder map runs once per DISTINCT key and only the key joins
    val perDoc =
      if (byteTokens)
        cleanDocs
          .select(col("doc_id"), explode(ByteTokenizer.runsCol).as("run"))
          .join(ByteTokenizer.byteRunCounts(cleanDocs, merges), "run")
          .groupBy("doc_id").agg(sum(col("n_subtokens")).as("n_bpe"))
      else
        cleanDocs
          .select(col("doc_id"), explode(words(col("text"))).as("word"))
          .join(Tokenizer.bpeWordCounts(cleanDocs, merges), "word")
          .groupBy("doc_id").agg(sum(col("n_subtokens")).as("n_bpe"))
    val toks = ordered.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("n_bpe"), lit(0L)).as("n_tokens"))
    (cleanDocs, toks)
  }

  /** The capstone's FINALE — [[pipelineProduce]] carried through to the
    * on-disk training artifact: the produced (gated, deduped,
    * decontaminated, excised) corpus written as shard files IN EPOCH
    * ORDER via [[graft.sources.Sinks.writeShardRows]] — shard_id =
    * floor(epoch-cumulative BPE tokens / budget), so each shard
    * directory is a contiguous budget-sized slice of the epoch stream
    * (pos is carried in the data; a loader sorts by it within a
    * shard). Returns the written manifest; `verifyShards(dir)` is the
    * loader's integrity gate. Same scale shape as the pipeline plus
    * one clustering repartition on shard_id.
    *
    * `tokenize = true` additionally materializes each produced doc's
    * `tokens array<int>` ([[Tokenizer.tokenizeDocs]] of the CLEANED
    * text — same encoder as the n_tokens counts, so len(tokens) ==
    * n_tokens by construction) and the all-column fingerprint then
    * certifies the ids themselves: "corpus in, trainable token ids
    * out", end to end. Costs one extra read of the memo-persisted
    * cleaned frame plus the per-doc reassembly shuffle.
    *
    * `byteTokens = true` switches the WHOLE token arithmetic — the
    * n_tokens budgets AND the `tokenize` arrays — to the C28/C30
    * byte-fallback encoder ([[ByteTokenizer.tokenizeDocsBytes]] under
    * `merges`, which should then be a byte-level table such as
    * [[ByteTokenizer.LearnedByteMerges]]): UNK-free ids a trainer can
    * load for ANY input bytes, with whitespace/punctuation priced as
    * real tokens (H8c's honest budget geometry) — the artifact-side
    * close of the r14 verdict's "byte ids stop at the query layer"
    * gap. len(tokens) == n_tokens still holds by construction (one
    * encoder for both), so budgets and arrays cannot drift. */
  def produceShards(docs: DataFrame, eval: DataFrame, dir: String,
      minWords: Long = 50L,
      stops: Seq[String] = TextAnalysis.GopherStops,
      merges: Seq[((String, String), String)] = Tokenizer.FixedMerges,
      budget: Long = 512L,
      seed: Long = 0L,
      tokenize: Boolean = false,
      byteTokens: Boolean = false): DataFrame = {
    require(budget > 0, "budget must be positive")
    val (cleanDocs, toks) =
      produceCore(docs, eval, minWords, stops, merges, seed, byteTokens)
    val assigned = graft.ops.ScaleOps.prefixSum(toks, "pos", "n_tokens", "cum_tokens")
      .select(col("doc_id"), col("pos"), col("n_tokens"),
        expr(s"(cum_tokens - n_tokens) div $budget").as("shard_id"))
    val rows = cleanDocs.join(assigned, "doc_id")
      .select(col("doc_id"), col("text"), col("n_tokens"), col("pos"),
        col("shard_id"))
    val out = if (!tokenize) rows else rows.join(
      (if (byteTokens) ByteTokenizer.tokenizeDocsBytes(cleanDocs, merges)
       else Tokenizer.tokenizeDocs(cleanDocs, merges))
        .select(col("doc_id"), col("tokens")), "doc_id")
    graft.sources.Sinks.writeShardRows(out, dir)
  }

  /** The STREAMING→ARTIFACT close of the loop: scheduled compaction of
    * [[graft.streaming.Streams.ingestStreamAppend]]'s staging lake
    * (micro-batch survivor docs accumulated as appended parquet) into
    * the D18 epoch-shard artifact via [[produceShards]]. The staging
    * rows first collapse by doc_id — a replayed micro-batch
    * double-appends identical (doc_id, text) rows, so the distinct is
    * the exactly-once repair, mirroring the signature store's
    * idempotence — then the FULL producing pipeline runs over the
    * accumulated lake: the stream's per-batch screens (gates → D13b →
    * decontamination) are a conservative prefilter of the batch
    * pipeline's own gates → exact-dedup → decontamination, so on a
    * corpus whose near-dups are exact duplicates the compacted
    * artifact is IDENTICAL to batch [[produceShards]] over the
    * concatenated input (StreamingSpec pins this end to end), and the
    * re-run screens cost one pass over survivors only. Excision and
    * the epoch shuffle run here, corpus-wide over the lake — span
    * duplication and epoch order are lake-level properties no
    * per-batch view can compute. */
  def compactShards(spark: org.apache.spark.sql.SparkSession,
      stagingDir: String, eval: DataFrame, dir: String,
      minWords: Long = 50L,
      stops: Seq[String] = TextAnalysis.GopherStops,
      merges: Seq[((String, String), String)] = Tokenizer.FixedMerges,
      budget: Long = 512L,
      seed: Long = 0L,
      tokenize: Boolean = false,
      byteTokens: Boolean = false): DataFrame = {
    // a missing staging lake means the stream staged nothing: fail
    // with intent instead of an opaque scan error — and never write
    // an artifact for it, because a scheduled compactor pointed at a
    // production `dir` would otherwise replace a good artifact with
    // an empty one
    val p = new org.apache.hadoop.fs.Path(stagingDir)
    require(p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p),
      s"staging lake $stagingDir does not exist — nothing to compact " +
        "(did the stream run with stagingDir set?)")
    // replay-duplicated rows (same doc_id, same text — at-least-once
    // delivery) collapse here; a doc_id carrying DIFFERENT texts is id
    // reuse for new content, which the keyed ingest stream fails loudly
    // on (ingestStreamKeyed's IllegalStateException) — match that
    // contract rather than keep an arbitrary row. The guard is a window
    // count folded into `text` via concat(coalesce(assert_true…), text)
    // so column pruning cannot drop it: every downstream stage consumes
    // text.
    val staged = spark.read.parquet(stagingDir).select("doc_id", "text")
      .dropDuplicates("doc_id", "text")
    val conflictFree = concat(
      coalesce(
        assert_true(
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id"))) === 1L,
          lit("compactShards: a doc_id appears in the staging lake with " +
            "conflicting texts — id reuse for new content; repair the " +
            "lake (the keyed ingest stream fails loudly on the same " +
            "condition)")).cast("string"),
        lit("")),
      col("text"))
    produceShards(
      staged.select(col("doc_id"), conflictFree.as("text")),
      eval, dir, minWords, stops, merges, budget, seed, tokenize, byteTokens)
  }

  /** Memo of [[pipelineProduce]]'s cleaned-text frame (see
    * [[graft.ops.PlanCache]]; released by [[graft.ops.Release]]). */
  private[this] val produceCache = new graft.ops.PlanCache(capacity = 2)

  val qPipelineProduce: Q = Q(
    "q_pipeline_produce",
    (s, d) => {
      val docs = Tables.documents(s, d)
      pipelineProduce(
        docs.filter(col("doc_id") % Contamination.EvalMod =!= 0),
        docs.filter(col("doc_id") % Contamination.EvalMod === 0),
        minWords = 10L, stops = TextAnalysis.CorpusStops, seed = 42L)
    },
    Some {
      val train =
        s"(SELECT * FROM documents WHERE doc_id % ${Contamination.EvalMod} <> 0)"
      val k = Contamination.NgramK
      val (a, p) = (Shards.ScrambleA, Shards.ScrambleP)
      val ctx = Shards.DefaultContextLen
      s"""WITH RECURSIVE ${TextAnalysis.sqlGopherCountsCte(train)},
      ${TextAnalysis.sqlGopherRepCtes(train)},
      prules AS (SELECT doc_id FROM gc WHERE ${TextAnalysis.sqlGopherKeptCond}),
      prep AS (SELECT doc_id FROM rsel WHERE ${TextAnalysis.sqlGopherRepKeptCond}),
      pgated AS (SELECT d.doc_id, d.text FROM $train d
        JOIN prules USING (doc_id) JOIN prep USING (doc_id)),
      pkeys2 AS (SELECT doc_id, text, md5(${sqlNormText("text")}) AS kk1,
          ${sqlPolyHash(sqlNormText("text"))} AS kk2 FROM pgated),
      psurv AS (SELECT doc_id, text FROM (
          SELECT *, min(doc_id) OVER (PARTITION BY kk1, kk2) AS mm FROM pkeys2) t
        WHERE doc_id = mm),
      ptk AS (SELECT doc_id, list_filter(${sqlWords("text")}, t -> t <> '') AS pw
        FROM psurv),
      pshg AS (SELECT doc_id, list_distinct(${sqlShingles("pw", k)}) AS sh FROM ptk),
      pevt AS (SELECT doc_id, list_filter(${sqlWords("text")}, t -> t <> '') AS pw
        FROM documents WHERE doc_id % ${Contamination.EvalMod} = 0),
      pevs AS (SELECT DISTINCT unnest(list_distinct(${sqlShingles("pw", k)})) AS s
        FROM pevt),
      pexp AS (SELECT doc_id, unnest(sh) AS s FROM pshg),
      phit AS (SELECT DISTINCT pexp.doc_id FROM pexp JOIN pevs USING (s)),
      pclean AS (SELECT s.doc_id, s.text FROM psurv s ANTI JOIN phit USING (doc_id)),
      ${Dedup.sqlExciseCtes("pclean")},
      pord AS (SELECT doc_id, row_number() OVER (ORDER BY
          ((doc_id % $p) * ((43 * $a) % $p)) % $p, doc_id) AS pos FROM xout),
      ${Shards.sqlBpeWordCountsFrom("xout", "text_clean")},
      pu AS (SELECT doc_id,
          unnest(list_filter(${sqlWords("text_clean")}, t -> t <> '')) AS word
        FROM xout),
      pcnt AS (SELECT pu.doc_id, CAST(sum(wc.n_sub) AS BIGINT) AS n
        FROM pu JOIN wc USING (word) GROUP BY pu.doc_id),
      ptoks2 AS (SELECT x.doc_id, o.pos, COALESCE(c.n, 0) AS n_tokens
        FROM xout x JOIN pord o USING (doc_id) LEFT JOIN pcnt c USING (doc_id)),
      pcum AS (SELECT doc_id, pos, n_tokens,
          CAST(sum(n_tokens) OVER (ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        FROM ptoks2)
      SELECT doc_id, pos, n_tokens,
        (cum_tokens - n_tokens) // $ctx AS seq_first,
        (cum_tokens - n_tokens) % $ctx AS seq_offset,
        CAST(CASE WHEN n_tokens > 0
          THEN (cum_tokens - 1) // $ctx - (cum_tokens - n_tokens) // $ctx + 1
          ELSE 0 END AS BIGINT) AS n_seqs
      FROM pcum ORDER BY doc_id"""
    })

  /** G6's batch twin as an oracle row: quality gate + exact content
    * dedup, NO near-dup stage — exactly the batch semantics
    * [[graft.streaming.Streams.curateStream]] converges to (proved by
    * the StreamsSpec differential on kept content). Registering it
    * with its own DuckDB oracle closes the G6 chain:
    * stream == batch (spec) and batch == DuckDB (hash). */
  val qStreamCurateBatch: Q = Q(
    "q_stream_curate_batch",
    (s, d) => curate(Tables.documents(s, d), dropNearDups = false)
      .select(col("doc_id"), col("source"), col("quality_score"))
      .orderBy("doc_id"),
    Some(s"""WITH ${TextAnalysis.sqlQualityCte("documents")},
      qualified AS (
        SELECT d.doc_id, d.text, d.source, q.quality_score
        FROM documents d JOIN q_scores q USING (doc_id)
        WHERE q.quality_score >= 0.3),
      keyed AS (
        SELECT *, md5(${sqlNormText("text")}) AS k1,
               ${sqlPolyHash(sqlNormText("text"))} AS k2
        FROM qualified)
      SELECT doc_id, source, quality_score FROM (
        SELECT *, min(doc_id) OVER (PARTITION BY k1, k2) AS m FROM keyed) t
      WHERE doc_id = m
      ORDER BY doc_id"""))

  val all: Seq[Q] =
    Seq(qCurate, qCurateCc, qPipelineAudit, qPipelineProduce, qStreamCurateBatch)
}
