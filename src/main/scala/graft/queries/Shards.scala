package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import graft.ops.ScaleOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sharding and sampling (SURVEY.md §2 H4/H5) — the last mile of
  * a training-data pipeline: pack the curated corpus into
  * fixed-token-budget shards, and draw deterministic per-stratum
  * samples for eval sets.
  */
object Shards {

  /** Assign each doc to a contiguous token-budget shard: docs are laid
    * out in `doc_id` order and a new shard starts whenever the running
    * token total crosses a `budget` boundary (shard = which budget
    * window the doc STARTS in, so shards hold ~budget tokens and every
    * shard is a contiguous id range — what a sequence-packing loader
    * expects to stream).
    *
    * Scale shape: the running total is [[ScaleOps.prefixSum]] — range
    * partition + per-partition cumsum + broadcast partition offsets —
    * NOT the single-partition global window (which is exactly what the
    * DuckDB oracle runs, making the hash match a correctness proof for
    * the distributed prefix sum). */
  def packShards(docs: DataFrame, budget: Long = 512): DataFrame = {
    require(budget > 0, "budget must be positive")
    val toks = docs.select(col("doc_id"),
      size(words(col("text"))).cast("long").as("n_tokens"))
    ScaleOps.prefixSum(toks, "doc_id", "n_tokens", "cum_tokens")
      .withColumn("shard_id", expr(s"(cum_tokens - n_tokens) div $budget"))
      .select("doc_id", "n_tokens", "cum_tokens", "shard_id")
      .orderBy("doc_id")
  }

  val qPackShards: Q = Q(
    "q_pack_shards",
    (s, d) => packShards(Tables.documents(s, d)),
    Some(s"""WITH toks AS (
        SELECT doc_id,
          CAST(len(list_filter(${sqlWords("text")}, t -> t <> '')) AS BIGINT) AS n_tokens
        FROM documents),
      cum AS (
        SELECT doc_id, n_tokens,
          CAST(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        FROM toks)
      SELECT doc_id, n_tokens, cum_tokens,
        (cum_tokens - n_tokens) // 512 AS shard_id
      FROM cum
      ORDER BY doc_id"""))

  /** Token-level sequence packing (H8) — the GPT-style concat-and-chop
    * trainer prep: the corpus is one token stream in doc_id order,
    * chopped into fixed `contextLen` sequences; each doc reports the
    * sequence it starts in, its offset there, and how many sequences it
    * SPANS (a doc longer than the remainder of its sequence crosses the
    * boundary — the thing [[packShards]]'s whole-doc bucketing cannot
    * express, and the reason loaders need these offsets). Same
    * scale shape as H4: the absolute token offset is the distributed
    * [[ScaleOps.prefixSum]], everything after is a map stage. */
  /** Default trainer context length (shared with the H8 oracle so the
    * two cannot drift). */
  val DefaultContextLen = 256L

  def packSequences(docs: DataFrame, contextLen: Long = DefaultContextLen): DataFrame = {
    require(contextLen > 0, "contextLen must be positive")
    packFromCounts(docs.select(col("doc_id"),
      size(words(col("text"))).cast("long").as("n_tokens")), contextLen)
  }

  /** The shared H8 packing tail: distributed prefix sum over a
    * (doc_id, n_tokens) frame, then the pure-map sequence geometry. */
  private def packFromCounts(toks: DataFrame, contextLen: Long): DataFrame =
    ScaleOps.prefixSum(toks, "doc_id", "n_tokens", "cum_tokens")
      .select(col("doc_id"), col("n_tokens"),
        expr(s"(cum_tokens - n_tokens) div $contextLen").as("seq_first"),
        expr(s"(cum_tokens - n_tokens) % $contextLen").as("seq_offset"),
        when(col("n_tokens") > 0,
          expr(s"(cum_tokens - 1) div $contextLen") -
            expr(s"(cum_tokens - n_tokens) div $contextLen") + 1)
          .otherwise(0L).as("n_seqs"))
      .orderBy("doc_id")

  /** H8b: sequence packing weighted by LEARNED BPE token counts — what
    * a trainer's loader actually consumes. [[packSequences]] budgets by
    * whitespace words; a real context window holds TOKENIZER tokens,
    * and fertility (BPE tokens per word) varies by word, so the two
    * packings drift apart exactly where it matters (rare/long words).
    * Each doc's token count is Σ over its words of the word's encoded
    * length under the C13 BPE encoder ([[Tokenizer.encodeWord]]) with a
    * FIXED merge table ([[Tokenizer.FixedMerges]] by default — frozen
    * tokenizers are the production posture; pass a freshly learned
    * table to re-tokenize).
    *
    * Scale shape: the encoder automaton runs once per DISTINCT word
    * (vocabulary-sized typed map, rank table broadcast — the C13
    * encoder shape); the corpus side is one explode + key-equi join on
    * the word + per-doc count agg (inverted-index shape, fixed-width
    * values); wordless docs re-enter by a doc_id-keyed left join; the
    * packing tail is the same distributed prefix sum as H8. The DuckDB
    * oracle replays the ENTIRE path — including the greedy encoder,
    * as a recursive CTE whose per-token-delimited `replace()` step is
    * exactly [[Tokenizer.encodeWord]]'s left-to-right non-overlapping
    * mergeAll — so the hash match proves the encoder, the fertility
    * join, and the distributed prefix sum in one check. (The oracle's
    * '|' delimiter is safe because [[words]] emits pure [a-z]+ runs.) */
  def packSequencesBpe(
      docs: DataFrame,
      merges: Seq[((String, String), String)] = Tokenizer.FixedMerges,
      contextLen: Long = DefaultContextLen): DataFrame = {
    require(contextLen > 0, "contextLen must be positive")
    val perWord = Tokenizer.bpeWordCounts(docs, merges)
    val perDoc = docs.select(col("doc_id"), explode(words(col("text"))).as("word"))
      .join(perWord, "word")
      .groupBy("doc_id").agg(sum(col("n_subtokens")).as("n_bpe"))
    val toks = docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_bpe"), lit(0L)).as("n_tokens"))
    packFromCounts(toks, contextLen)
  }

  val qPackSequences: Q = Q(
    "q_pack_sequences",
    (s, d) => packSequences(Tables.documents(s, d)),
    Some(s"""WITH toks AS (
        SELECT doc_id,
          CAST(len(list_filter(${sqlWords("text")}, t -> t <> '')) AS BIGINT) AS n_tokens
        FROM documents),
      cum AS (
        SELECT doc_id, n_tokens,
          CAST(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        FROM toks)
      SELECT doc_id, n_tokens,
        (cum_tokens - n_tokens) // $DefaultContextLen AS seq_first,
        (cum_tokens - n_tokens) % $DefaultContextLen AS seq_offset,
        CAST(CASE WHEN n_tokens > 0
          THEN (cum_tokens - 1) // $DefaultContextLen - (cum_tokens - n_tokens) // $DefaultContextLen + 1
          ELSE 0 END AS BIGINT) AS n_seqs
      FROM cum ORDER BY doc_id"""))

  /** Oracle-side CTE chain replaying the frozen-table greedy encoder
    * per distinct corpus word → `wc(word, n_sub)`. Must sit under a
    * `WITH RECURSIVE`. The per-token-delimited `replace()` step is
    * exactly [[Tokenizer.encodeWord]]'s left-to-right non-overlapping
    * mergeAll ("|a||a||a|" → "|aa||a|"); the '|' delimiter is safe
    * because [[words]] emits pure [a-z]+ runs. */
  private[queries] def sqlBpeWordCountsFrom(
      tbl: String, textCol: String,
      merges: Seq[((String, String), String)] = Tokenizer.FixedMerges): String =
    s"""m(rank, l, r) AS (VALUES ${Tokenizer.mergesSqlValues(merges)}),
        dw AS (SELECT DISTINCT w AS word FROM (
          SELECT unnest(list_filter(${sqlWords(textCol)}, t -> t <> '')) AS w
          FROM $tbl)),
        enc AS (
          SELECT word,
            regexp_replace(word, '(.)', '|\\1|', 'g') || '|</w>|' AS seq,
            0 AS step
          FROM dw
          UNION ALL
          SELECT e.word, replace(e.seq, b.pat, b.rep) AS seq, e.step + 1 AS step
          FROM enc e, LATERAL (
            SELECT '|' || m.l || '||' || m.r || '|' AS pat,
                   '|' || m.l || m.r || '|' AS rep
            FROM m
            WHERE contains(e.seq, '|' || m.l || '||' || m.r || '|')
            ORDER BY m.rank LIMIT 1) b),
        wseq AS (SELECT word, arg_max(seq, step) AS fseq
          FROM enc GROUP BY word),
        wc AS (SELECT word,
            (length(fseq) - length(replace(fseq, '|', ''))) // 2 AS n_sub
          FROM wseq)"""

  private def sqlBpeWordCounts: String = sqlBpeWordCountsFrom("documents", "text")

  val qPackSequencesBpe: Q = Q(
    "q_pack_sequences_bpe",
    (s, d) => packSequencesBpe(Tables.documents(s, d)),
    Some(s"""WITH RECURSIVE
        $sqlBpeWordCounts,
        u AS (SELECT doc_id,
            unnest(list_filter(${sqlWords("text")}, t -> t <> '')) AS word
          FROM documents),
        cnt AS (SELECT u.doc_id, CAST(sum(wc.n_sub) AS BIGINT) AS n
          FROM u JOIN wc USING (word) GROUP BY u.doc_id),
        toks AS (SELECT d.doc_id, COALESCE(c.n, 0) AS n_tokens
          FROM documents d LEFT JOIN cnt c USING (doc_id)),
        cum AS (SELECT doc_id, n_tokens,
            CAST(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
          FROM toks)
        SELECT doc_id, n_tokens,
          (cum_tokens - n_tokens) // $DefaultContextLen AS seq_first,
          (cum_tokens - n_tokens) % $DefaultContextLen AS seq_offset,
          CAST(CASE WHEN n_tokens > 0
            THEN (cum_tokens - 1) // $DefaultContextLen - (cum_tokens - n_tokens) // $DefaultContextLen + 1
            ELSE 0 END AS BIGINT) AS n_seqs
        FROM cum ORDER BY doc_id"""))

  /** H8c: sequence packing weighted by BYTE-FALLBACK token counts —
    * the C28 loader's geometry. [[packSequencesBpe]] budgets by BPE
    * tokens over [a-z] words, which undercounts what a byte-fallback
    * trainer's window actually holds: punctuation, digits, casing,
    * and WHITESPACE runs are all real tokens there (GPT-2's context
    * holds them too). Each doc's count is Σ over its `\\S+|\\s+` runs
    * of the run's encoded length under [[ByteTokenizer]] (the same
    * distinct-run automaton as C28 — one definition), and the packing
    * tail is the SAME distributed prefix sum as H8/H8b. The oracle
    * replays encoder, run-count join, and prefix sum in one hash. */
  def packSequencesBytes(
      docs: DataFrame,
      merges: Seq[((String, String), String)] = Tokenizer.FixedMerges,
      contextLen: Long = DefaultContextLen): DataFrame = {
    require(contextLen > 0, "contextLen must be positive")
    val perRun = ByteTokenizer.byteRunCounts(docs, merges)
    val perDoc = docs
      .select(col("doc_id"), explode(ByteTokenizer.runsCol).as("run"))
      .join(perRun, "run")
      .groupBy("doc_id").agg(sum(col("n_subtokens")).as("n_b"))
    val toks = docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_b"), lit(0L)).as("n_tokens"))
    packFromCounts(toks, contextLen)
  }

  val qPackSequencesBytes: Q = Q(
    "q_pack_sequences_bytes",
    (s, d) => packSequencesBytes(Tables.documents(s, d)),
    Some(s"""WITH RECURSIVE
        ${ByteTokenizer.sqlByteRunSeqCtes("documents")},
        rc AS (SELECT run,
            (length(fseq) - length(replace(fseq, '|', ''))) // 2 AS n_sub
          FROM rseq),
        cnt AS (SELECT d.doc_id, CAST(sum(rc.n_sub) AS BIGINT) AS n
          FROM druns d JOIN rc USING (run) GROUP BY d.doc_id),
        toks AS (SELECT d.doc_id, COALESCE(c.n, 0) AS n_tokens
          FROM documents d LEFT JOIN cnt c USING (doc_id)),
        cum AS (SELECT doc_id, n_tokens,
            CAST(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
          FROM toks)
        SELECT doc_id, n_tokens,
          (cum_tokens - n_tokens) // $DefaultContextLen AS seq_first,
          (cum_tokens - n_tokens) % $DefaultContextLen AS seq_offset,
          CAST(CASE WHEN n_tokens > 0
            THEN (cum_tokens - 1) // $DefaultContextLen - (cum_tokens - n_tokens) // $DefaultContextLen + 1
            ELSE 0 END AS BIGINT) AS n_seqs
        FROM cum ORDER BY doc_id"""))

  // ----------------------------------------------------------------
  // H14 — best-fit sequence packing (whole docs, no cross-doc splits)
  // ----------------------------------------------------------------

  /** Best-fit sequence packing (H14): assign each doc WHOLLY to one
    * `contextLen`-token bin — the loader layout for trainers that mask
    * cross-document attention, where [[packSequences]]' concat-and-chop
    * (which splits a doc across sequence boundaries) wastes the split
    * docs' long-range signal. Classic bin packing is inherently
    * sequential (first-fit's bin state depends on every earlier doc),
    * so this runs the HARMONIC SHELF discipline (Lee & Lee, "A simple
    * on-line bin-packing algorithm", JACM 1985 — the standard
    * parallelizable FFD relative): docs land in size classes
    * c = contextLen div n_tokens (class c sizes lie in
    * (L/(c+1), L/c]), and a class-c bin holds exactly c docs, so
    * within a class the assignment is pure rank arithmetic — rank r
    * goes to bin (r−1) div c, slot (r−1) mod c. Every class-c bin
    * except possibly the last is > c/(c+1) · L full (≥ 50% at c = 1,
    * → 100% as c grows); nothing is ever split.
    *
    * Edge classes: n_tokens > contextLen ⇒ class 0, one doc per bin
    * (the loader chops those internally — they'd be split under ANY
    * whole-doc policy); n_tokens = 0 ⇒ class −1, bin −1 (nothing to
    * pack). Output: (doc_id, n_tokens, size_class, bin_id, slot) with
    * bin ids dense and deterministic (class-major, rank order).
    *
    * Scale shape: rank-in-class comes from ONE distributed
    * [[ScaleOps.prefixSum]] over the packed (size_class, doc_id)
    * order key — NEVER a Window.partitionBy(size_class), whose
    * per-class partitions inherit the full skew of the corpus' size
    * distribution (one hot class = one hot task). The per-class
    * starts/offsets are a ≤ contextLen+1-row aggregate (bounded by
    * the PARAMETER, not the corpus) cumulated in a domain-sized
    * window and broadcast back. The DuckDB oracle replays the
    * partitioned-window formulation, so the hash match is the
    * distribution-correctness proof for the prefix-sum form (the H10
    * argument). */
  def packBestFit(docs: DataFrame, contextLen: Long = DefaultContextLen): DataFrame = {
    require(contextLen >= 1 && contextLen <= 65536,
      s"contextLen must be in [1, 65536], got $contextLen")
    val toks = docs.select(col("doc_id"),
      size(words(col("text"))).cast("long").as("n_tokens"))
    val sized = toks.withColumn("size_class",
      when(col("n_tokens") === 0L, lit(-1L))
        .otherwise(expr(s"$contextLen div n_tokens")))
    val packable = sized.filter(col("size_class") >= 0L)
    // packed order key (size_class major, doc_id minor): class fits in
    // 17 bits (<= 65536), leaving 2^46 ids — out-of-domain ids fail
    // loudly per row rather than silently colliding (the H10 rule)
    val keyed = packable.select(col("doc_id"), col("n_tokens"),
        col("size_class"),
        (col("size_class") * (1L << 46) +
          when(col("doc_id") >= 0 && col("doc_id") < (1L << 46), col("doc_id"))
            .otherwise(raise_error(concat(
              lit("packBestFit: doc_id out of [0, 2^46) — packed order key would collide: "),
              col("doc_id"))))).as("ord_key"))
      .withColumn("one", lit(1L))
    val pos = graft.ops.ScaleOps.prefixSum(keyed, "ord_key", "one", "pos")
    // per-class geometry: counts, capacity, docs/bins before the class —
    // a parameter-bounded frame (<= contextLen + 1 classes), cumulated
    // in a domain-sized window and broadcast back to the corpus
    val wCls = Window.orderBy("size_class")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cls = packable.groupBy("size_class")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("capacity",
        when(col("size_class") === 0L, 1L).otherwise(col("size_class")))
      .withColumn("class_start", coalesce(sum(col("cnt")).over(wCls), lit(0L)))
      .withColumn("bins_before", coalesce(
        sum(expr("(cnt + capacity - 1) div capacity")).over(wCls),
        lit(0L)))
    val packed = pos.join(broadcast(cls), "size_class")
      .select(col("doc_id"), col("n_tokens"), col("size_class"),
        (col("bins_before") +
          expr("(pos - class_start - 1) div capacity")).as("bin_id"),
        pmod(col("pos") - col("class_start") - 1, col("capacity")).as("slot"))
    val empties = sized.filter(col("size_class") === -1L)
      .select(col("doc_id"), col("n_tokens"), col("size_class"),
        lit(-1L).as("bin_id"), lit(0L).as("slot"))
    packed.unionByName(empties).orderBy("doc_id")
  }

  /** One-row packing audit: [[packBestFit]]'s bin count and waste next
    * to the concat-and-chop baseline's split-doc count — the trade the
    * operator exists to win (chop wastes NO capacity but splits docs;
    * best-fit splits NOTHING and bounds waste by the shelf guarantee).
    * `waste_tokens` counts unused capacity in regular (class >= 1)
    * bins only: oversize docs overflow any whole-doc policy and
    * zero-token docs occupy no bin, so both are reported separately
    * rather than polluting the waste number. All-integer output —
    * exactly replayable. */
  def packBestFitStats(docs: DataFrame, contextLen: Long = DefaultContextLen): DataFrame = {
    val packed = packBestFit(docs, contextLen)
    val regular = packed.filter(col("size_class") >= 1L)
    val binsAgg = regular
      .groupBy("bin_id").agg(sum(col("n_tokens")).as("fill"))
      .agg(count(lit(1)).as("n_bins"),
        coalesce(sum(lit(contextLen) - col("fill")), lit(0L)).as("waste_tokens"),
        coalesce(sum(col("fill")), lit(0L)).as("packed_tokens"))
    val classAgg = packed.agg(
      sum(when(col("size_class") === 0L, 1L).otherwise(0L)).as("n_oversize"),
      sum(when(col("size_class") === -1L, 1L).otherwise(0L)).as("n_empty"))
    val chopSplit = packSequences(docs, contextLen)
      .agg(sum(when(col("n_seqs") >= 2L, 1L).otherwise(0L)).as("chop_split_docs"))
    binsAgg.crossJoin(classAgg).crossJoin(chopSplit)
      .select(col("n_bins"), col("packed_tokens"), col("waste_tokens"),
        col("n_oversize"), col("n_empty"), col("chop_split_docs"))
  }

  val qPackBestFit: Q = Q(
    "q_pack_bestfit",
    (s, d) => packBestFit(Tables.documents(s, d)),
    Some(s"""WITH toks AS (
        SELECT doc_id,
          CAST(len(list_filter(${sqlWords("text")}, t -> t <> '')) AS BIGINT) AS n_tokens
        FROM documents),
      sized AS (SELECT doc_id, n_tokens,
          CASE WHEN n_tokens = 0 THEN CAST(-1 AS BIGINT)
            ELSE $DefaultContextLen // n_tokens END AS size_class
        FROM toks),
      ranked AS (SELECT doc_id, n_tokens, size_class,
          row_number() OVER (PARTITION BY size_class ORDER BY doc_id) AS rk
        FROM sized WHERE size_class >= 0),
      cls AS (SELECT size_class, count(*) AS cnt,
          CASE WHEN size_class = 0 THEN 1 ELSE size_class END AS capacity
        FROM ranked GROUP BY 1),
      cls2 AS (SELECT size_class, capacity,
          CAST(coalesce(sum((cnt + capacity - 1) // capacity)
            OVER (ORDER BY size_class
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS bins_before
        FROM cls)
      SELECT doc_id, n_tokens, size_class,
        CAST(bins_before + (rk - 1) // capacity AS BIGINT) AS bin_id,
        CAST((rk - 1) % capacity AS BIGINT) AS slot
      FROM ranked JOIN cls2 USING (size_class)
      UNION ALL
      SELECT doc_id, n_tokens, size_class,
        CAST(-1 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS slot
      FROM sized WHERE size_class = -1
      ORDER BY doc_id"""))

  val qPackBestFitStats: Q = Q(
    "q_pack_bestfit_stats",
    (s, d) => packBestFitStats(Tables.documents(s, d)),
    Some(s"""WITH toks AS (
        SELECT doc_id,
          CAST(len(list_filter(${sqlWords("text")}, t -> t <> '')) AS BIGINT) AS n_tokens
        FROM documents),
      sized AS (SELECT doc_id, n_tokens,
          CASE WHEN n_tokens = 0 THEN CAST(-1 AS BIGINT)
            ELSE $DefaultContextLen // n_tokens END AS size_class
        FROM toks),
      ranked AS (SELECT doc_id, n_tokens, size_class,
          row_number() OVER (PARTITION BY size_class ORDER BY doc_id) AS rk
        FROM sized WHERE size_class >= 0),
      cls AS (SELECT size_class, count(*) AS cnt,
          CASE WHEN size_class = 0 THEN 1 ELSE size_class END AS capacity
        FROM ranked GROUP BY 1),
      cls2 AS (SELECT size_class, capacity,
          CAST(coalesce(sum((cnt + capacity - 1) // capacity)
            OVER (ORDER BY size_class
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS bins_before
        FROM cls),
      packed AS (SELECT doc_id, n_tokens, size_class,
          CAST(bins_before + (rk - 1) // capacity AS BIGINT) AS bin_id
        FROM ranked JOIN cls2 USING (size_class)),
      bins AS (SELECT bin_id, sum(n_tokens) AS fill
        FROM packed WHERE size_class >= 1 GROUP BY 1),
      ba AS (SELECT CAST(count(*) AS BIGINT) AS n_bins,
          CAST(coalesce(sum($DefaultContextLen - fill), 0) AS BIGINT) AS waste_tokens,
          CAST(coalesce(sum(fill), 0) AS BIGINT) AS packed_tokens
        FROM bins),
      ca AS (SELECT
          CAST(sum(CASE WHEN size_class = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize,
          CAST(sum(CASE WHEN size_class = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
        FROM sized),
      cum AS (SELECT doc_id, n_tokens,
          CAST(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        FROM toks),
      ch AS (SELECT CAST(sum(CASE WHEN n_tokens > 0 AND
            (cum_tokens - 1) // $DefaultContextLen
              - (cum_tokens - n_tokens) // $DefaultContextLen + 1 >= 2
            THEN 1 ELSE 0 END) AS BIGINT) AS chop_split_docs
        FROM cum)
      SELECT n_bins, packed_tokens, waste_tokens, n_oversize, n_empty,
        chop_split_docs
      FROM ba, ca, ch"""))

  /** Multiplier/modulus of the portable id scrambler (a fixed LCG step —
    * reproducible in any engine, unlike xxhash). */
  private[queries] val ScrambleA = 2654435761L
  private[queries] val ScrambleP = 1000000007L

  /** Seeded deterministic keep-draw for SAMPLE-BASED quantizer /
    * centroid fits (the 100 TB fit path of [[graft.queries.Similarity]]
    * and [[graft.queries.KMeansLloyd]]): keep a row iff its seeded LCG
    * scramble lands below `fraction`·P. The draw is a pure function of
    * the ID — unlike `DataFrame.sample`, whose Bernoulli draw hangs
    * off partition iteration order, this survives repartitioning,
    * retries, and engine changes (the H5/H10 portability argument), so
    * a sample-fit model is as reproducible as a full fit. Seeding
    * follows [[shuffleOrder]]: the multiplier scales with the seed
    * (any nonzero multiplier mod prime P is a bijection), so seeds
    * select unrelated subsets. `fraction = 1.0` keeps everything
    * (every scramble < P) — the default full fit costs no draw. */
  private[graft] def fitKeep(id: Column, fraction: Double, seed: Long): Column = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fitFraction must be in (0, 1], got $fraction")
    require(seed >= 0 && seed < ScrambleP - 1,
      s"seed must be in [0, ${ScrambleP - 1})")
    val mult = ((seed + 1) % ScrambleP) * ScrambleA % ScrambleP
    ((id % ScrambleP) * mult) % ScrambleP <
      lit((fraction * ScrambleP).toLong)
  }

  /** Deterministic stratified sample: the `n` docs per stratum that rank
    * first in scrambled-id order — a fixed, engine-portable pseudo-random
    * draw (LCG scramble of doc_id), so eval sets are reproducible run to
    * run and engine to engine. The rank window auto-rewrites to the
    * bounded-heap TopKPerKey operator: the exchange carries at most n
    * rows per stratum per partition, not the corpus.
    *
    * The id is reduced mod P BEFORE the multiply: (P−1)·A ≈ 2.7e18
    * stays inside Long, where doc_id·A overflows past doc_id ≈ 3.5e9 —
    * an ANSI-mode error in Spark and an out-of-range error in DuckDB,
    * i.e. exactly the corpus sizes this operator exists for. Ids P
    * apart share a scramble; the doc_id tiebreak keeps the order
    * total. */
  def stratifiedSample(
      docs: DataFrame,
      strata: String = "source",
      n: Int = 10): DataFrame = {
    require(n > 0, "n must be positive")
    val scrambled = docs.select(col("doc_id"), col(strata),
      (((col("doc_id") % ScrambleP) * ScrambleA) % ScrambleP).as("scramble"))
    scrambled
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(strata)).orderBy(col("scramble"), col("doc_id"))))
      .filter(col("rk") <= n)
      .select(col("doc_id"), col(strata), col("rk").cast("long").as("rk"))
      .orderBy(col(strata), col("rk"))
  }

  val qStratifiedSample: Q = Q(
    "q_stratified_sample",
    (s, d) => stratifiedSample(Tables.documents(s, d)),
    Some(s"""SELECT doc_id, source, rk FROM (
        SELECT doc_id, source,
          row_number() OVER (PARTITION BY source
            ORDER BY ((doc_id % $ScrambleP) * $ScrambleA) % $ScrambleP, doc_id) AS rk
        FROM documents) t
      WHERE rk <= 10
      ORDER BY source, rk"""))

  /** H10: seeded deterministic global shuffle — the reproducible
    * training-data ORDER every loader needs: `pos` is each doc's
    * 1-based position in the (seeded LCG scramble, doc_id) total
    * order, so the same (corpus, seed) yields the same epoch order on
    * any engine, any partitioning, any rerun, and a different seed
    * yields an unrelated order (epoch reshuffling without RNG state).
    *
    * Scale shape: position assignment is the H4 distributed prefix
    * sum over a composite order key — one range exchange +
    * per-partition counting + broadcast offsets, NEVER a global
    * window dragging the corpus through one partition (the DuckDB
    * oracle runs exactly that single-partition `row_number()`, so the
    * hash match is the distribution-correctness proof).
    *
    * The composite key `scramble · 2^32 + doc_id` makes the order
    * total (scramble collides for ids P apart) and stays inside Long
    * for doc_id < 2^32; ids outside [0, 2^32) raise a per-row error
    * rather than silently colliding — re-key wider ids first. */
  def shuffleOrder(docs: DataFrame, seed: Long = 0L): DataFrame = {
    // seed = P-1 is excluded up front: (seed+1) ≡ 0 (mod P) would
    // degenerate the multiplier to 0 — bounding the domain beats
    // admitting a documented-valid seed that always crashes deeper in
    require(seed >= 0 && seed < ScrambleP - 1,
      s"seed must be in [0, ${ScrambleP - 1})")
    // the seed SCALES the multiplier: any nonzero multiplier mod prime
    // P is a bijection, and multipliers A apart give unrelated
    // permutations. Two rejected designs, both caught by MixingSpec's
    // seed-sensitivity check: an ADDITIVE seed rotates the value range
    // (order-preserving except at the wraparound), and a +seed
    // multiplier perturbs each scramble by only ±seed·id — far below
    // the ~P/n gaps between 200 scrambles, so no ranks crossed and
    // adjacent seeds produced the identical epoch order.
    val mult = ((seed + 1) % ScrambleP) * ScrambleA % ScrambleP
    val keyed = docs.select(col("doc_id"),
        (((col("doc_id") % ScrambleP) * mult) % ScrambleP).as("scramble"))
      .select(col("doc_id"),
        // ids outside [0, 2^32) would COLLIDE in the packed key and
        // silently break the total order (nondeterministic pos under
        // retries/partitioning — the exact thing this operator exists
        // to prevent). Fail loudly per-row instead; re-key wider ids.
        (col("scramble") * 4294967296L +
          when(col("doc_id") >= 0 && col("doc_id") < 4294967296L, col("doc_id"))
            .otherwise(raise_error(concat(
              lit("shuffleOrder: doc_id out of [0, 2^32) — packed order key would collide: "),
              col("doc_id"))))).as("ord_key"))
      .withColumn("one", lit(1L))
    graft.ops.ScaleOps.prefixSum(keyed, "ord_key", "one", "pos")
      .select(col("doc_id"), col("pos"))
      .orderBy("doc_id")
  }

  val qShuffleOrder: Q = Q(
    "q_shuffle_order",
    (s, d) => shuffleOrder(Tables.documents(s, d), seed = 42L),
    Some(s"""SELECT doc_id,
        row_number() OVER (ORDER BY
          ((doc_id % $ScrambleP) * ((43 * ${ScrambleA}) % $ScrambleP)) % $ScrambleP,
          doc_id) AS pos
      FROM documents
      ORDER BY doc_id"""))

  /** H11: weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis, "Weighted random sampling with a reservoir", IPL 2006 —
    * the A-ES scheme): draw `k` docs with inclusion probability
    * proportional to a per-doc weight (here token count) by ranking
    * every doc on key = ln(u)/w and taking the top `k` — the
    * u^(1/w)-order draw, ln-monotone. The quality/length-weighted
    * subsample step of a training-data pipeline ("take 10M docs
    * ∝ weight") with NO RNG state: u is the portable seeded LCG
    * scramble (the [[stratifiedSample]] draw, seed-scaled multiplier
    * like [[shuffleOrder]]), so the draw is reproducible run to run
    * and engine to engine; seed = epoch number.
    *
    * Determinism: ln(u) quantizes to 2^20 fixed point BEFORE the
    * divide (the H9 rule — raw ln drifts 1 ULP JVM-vs-libm), so the
    * key is ONE double division of identical exact integers in both
    * engines; ties break on doc_id. Token-less docs are excluded:
    * weight 0 means zero inclusion probability (and 1/w undefined).
    *
    * Scale shape: a pure shuffle-free map stage (scramble, ln,
    * divide) + TakeOrderedAndProject top-k (per-partition bounded
    * heaps, k-row driver merge). Nothing corpus-sized moves. */
  def weightedSample(docs: DataFrame, k: Int = 25, seed: Long = 0L): DataFrame =
    weightedSampleFrom(docs.select(col("doc_id"),
      size(words(col("text"))).cast("long").as("weight")), k, seed)

  /** The shared A-ES core over a prepared (doc_id, weight) frame —
    * [[weightedSample]] feeds it whitespace token counts,
    * [[weightedSampleBpe]] learned-tokenizer counts; any caller with
    * its own weight column (quality scores, importance weights) can
    * use it directly. */
  def weightedSampleFrom(weighted: DataFrame, k: Int, seed: Long): DataFrame = {
    require(k > 0, "k must be positive")
    esKeyed(weighted, seed)
      .orderBy(col("es_key").desc, col("doc_id"))
      .limit(k)
  }

  /** THE A-ES key projection — (doc_id, weight, es_key) with
    * zero-weight rows excluded — shared by [[weightedSampleFrom]] and
    * the streaming form ([[graft.streaming.Streams
    * .weightedSampleStream]]): the key is a pure function of
    * (doc_id, weight), which is exactly what makes the stream's
    * accumulated top-k a SET function of the delivered docs (and the
    * stream == batch twin exact); a drifted copy would break that
    * equality silently. */
  private[graft] def esKeyed(weighted: DataFrame, seed: Long): DataFrame = {
    require(seed >= 0 && seed < ScrambleP - 1,
      s"seed must be in [0, ${ScrambleP - 1})")
    val mult = ((seed + 1) % ScrambleP) * ScrambleA % ScrambleP
    // pmod, not %: a negative doc_id would drive u <= 0 and ln(u) to
    // null, silently ejecting the doc from the draw
    weighted.select(col("doc_id"), col("weight"),
        ((pmod(col("doc_id"), lit(ScrambleP)) * mult % ScrambleP + 1L).cast("double") /
          ScrambleP.toDouble).as("u"))
      .filter(col("weight") > 0)
      .select(col("doc_id"), col("weight"),
        (round(log(col("u")) * lit(1048576.0)).cast("long").cast("double") /
          col("weight").cast("double")).as("es_key"))
  }

  /** H11b: the A-ES draw weighted by LEARNED BPE token counts — the
    * H8b re-weighting applied to sampling, so "take k docs ∝ tokens"
    * prices docs in the units a trainer pays for them. Same scale
    * shape as both parents: the per-doc count subplan is H8b's
    * (distinct-word encoder map + word-keyed join + per-doc agg), the
    * draw is a pure map + TakeOrderedAndProject. Wordless docs carry
    * weight 0 and are excluded by the A-ES zero-weight rule — so no
    * left-join resurrection is needed here, unlike packing. */
  def weightedSampleBpe(
      docs: DataFrame,
      k: Int = 25,
      seed: Long = 0L,
      merges: Seq[((String, String), String)] = Tokenizer.FixedMerges): DataFrame = {
    val perWord = Tokenizer.bpeWordCounts(docs, merges)
    val perDoc = docs.select(col("doc_id"), explode(words(col("text"))).as("word"))
      .join(perWord, "word")
      .groupBy("doc_id").agg(sum(col("n_subtokens")).as("weight"))
    weightedSampleFrom(perDoc, k, seed)
  }

  val qWeightedSample: Q = Q(
    "q_weighted_sample",
    (s, d) => weightedSample(Tables.documents(s, d), k = 25, seed = 42L),
    Some {
      val mult = (43L * ScrambleA) % ScrambleP
      val w = s"CAST(len(list_filter(${sqlWords("text")}, t -> t <> '')) AS BIGINT)"
      s"""SELECT doc_id, weight, es_key FROM (
          SELECT doc_id, $w AS weight,
            CAST(CAST(round(ln(
                CAST((((doc_id % ${ScrambleP}) + ${ScrambleP}) % ${ScrambleP} * $mult) % ${ScrambleP} + 1 AS DOUBLE)
                  / ${ScrambleP}.0::DOUBLE) * 1048576.0::DOUBLE) AS BIGINT) AS DOUBLE)
              / CAST($w AS DOUBLE) AS es_key
          FROM documents) t
        WHERE weight > 0
        ORDER BY es_key DESC, doc_id LIMIT 25"""
    })

  val qWeightedSampleBpe: Q = Q(
    "q_weighted_sample_bpe",
    (s, d) => weightedSampleBpe(Tables.documents(s, d), k = 25, seed = 42L),
    Some {
      val mult = (43L * ScrambleA) % ScrambleP
      s"""WITH RECURSIVE
          $sqlBpeWordCounts,
          u AS (SELECT doc_id,
              unnest(list_filter(${sqlWords("text")}, t -> t <> '')) AS word
            FROM documents),
          cnt AS (SELECT u.doc_id, CAST(sum(wc.n_sub) AS BIGINT) AS weight
            FROM u JOIN wc USING (word) GROUP BY u.doc_id)
        SELECT doc_id, weight, es_key FROM (
          SELECT doc_id, weight,
            CAST(CAST(round(ln(
                CAST((((doc_id % ${ScrambleP}) + ${ScrambleP}) % ${ScrambleP} * $mult) % ${ScrambleP} + 1 AS DOUBLE)
                  / ${ScrambleP}.0::DOUBLE) * 1048576.0::DOUBLE) AS BIGINT) AS DOUBLE)
              / CAST(weight AS DOUBLE) AS es_key
          FROM cnt) t
        WHERE weight > 0
        ORDER BY es_key DESC, doc_id LIMIT 25"""
    })

  /** Domain-mix resampling (SURVEY.md §2 H6) — the "data mixing" stage
    * of a training-data pipeline: rebalance the corpus toward a target
    * token distribution over a grouping column (here: uniform across
    * groups) by deterministically downsampling over-represented groups.
    * Each group's keep-rate is min(1, target_tokens / group_tokens) and
    * each doc's keep/drop draw is the same portable LCG scramble
    * [[stratifiedSample]] uses — reproducible run to run and engine to
    * engine, no RNG state anywhere.
    *
    * Determinism: rates are a fixed sequence of IEEE ops over exact
    * integer stats (each individually correctly rounded in any engine);
    * the keep test compares the integer scramble (< 2^30, exact as a
    * double) against rate·P.
    *
    * Scale shape: group stats are one map-side-combinable aggregation;
    * the rate frame is #groups rows (broadcast); the sample itself is a
    * pure map-filter over the corpus. No corpus-wide shuffle at all. */
  def domainMix(docs: DataFrame, group: String = "lang"): DataFrame = {
    val per = docs.select(col("doc_id"), col(group),
      size(words(col("text"))).cast("long").as("n_tokens"),
      (((col("doc_id") % ScrambleP) * ScrambleA) % ScrambleP)
        .cast("double").as("scramble"))
    val gstats = per.groupBy(col(group))
      .agg(sum(col("n_tokens")).as("g_tokens"))
    // global totals via a window over the #groups-row stats frame (NOT a
    // separate aggregate, which would re-evaluate the whole corpus scan
    // behind gstats a second time). The unpartitioned window is safe
    // here by construction: its input is one row per group, never the
    // corpus.
    val w = Window.partitionBy()
    val rated = gstats
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("t_tokens", sum(col("g_tokens")).over(w))
      .withColumn("rate", least(lit(1.0),
        (col("t_tokens").cast("double") * (lit(1.0) / col("k").cast("double"))) /
          col("g_tokens").cast("double")))
      .select(col(group), col("rate"))
    per.join(broadcast(rated), group)
      .withColumn("keep", col("scramble") < col("rate") * lit(ScrambleP.toDouble))
  }

  val qDomainMix: Q = Q(
    "q_domain_mix",
    (s, d) => domainMix(Tables.documents(s, d))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_before"),
        sum(col("n_tokens")).as("tok_before"),
        min(col("rate")).as("rate"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_after"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("tok_after"))
      .orderBy("lang"),
    Some(s"""WITH per AS (
        SELECT doc_id, lang,
          CAST(len(list_filter(${sqlWords("text")}, t -> t <> '')) AS BIGINT) AS n_tokens,
          CAST(((doc_id % $ScrambleP) * $ScrambleA) % $ScrambleP AS DOUBLE) AS scramble
        FROM documents),
      g AS (SELECT lang, sum(n_tokens) AS g_tokens FROM per GROUP BY 1),
      t AS (SELECT count(*) AS k, sum(g_tokens) AS t_tokens FROM g),
      rated AS (
        SELECT lang, LEAST(1.0::DOUBLE,
          (CAST(t_tokens AS DOUBLE) * (1.0::DOUBLE / CAST(k AS DOUBLE)))
            / CAST(g_tokens AS DOUBLE)) AS rate
        FROM g CROSS JOIN t)
      SELECT lang,
        count(*) AS n_before,
        CAST(sum(n_tokens) AS BIGINT) AS tok_before,
        min(rate) AS rate,
        CAST(sum(CASE WHEN scramble < rate * 1000000007.0::DOUBLE THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
        CAST(sum(CASE WHEN scramble < rate * 1000000007.0::DOUBLE THEN n_tokens ELSE 0 END) AS BIGINT) AS tok_after
      FROM per JOIN rated USING (lang)
      GROUP BY lang
      ORDER BY lang"""))

  /** H6b: temperature-based domain mixing (the UniMax / multilingual-
    * BERT sampling family): instead of equalizing token budgets, each
    * group's target share is ∝ `g_tokens^alpha` — `alpha = 1` keeps the
    * natural distribution, `alpha → 0` approaches uniform, and the
    * default 0.5 is the standard compromise that upsamples tail
    * domains without flattening the head.
    *
    * Determinism at `alpha = 0.5`: the weight is `sqrt` (a basic IEEE
    * op — correctly rounded, bit-identical in any engine, unlike
    * `pow`), normalized by the LARGEST group's weight (so the
    * quantized value is bounded by 2^20 — a raw `weight · 2^20` would
    * overflow Long for alpha near 1 on a ≥ tens-of-TB group and
    * silently wrap every rate negative), quantized to 2^20 fixed-point
    * integers (round-half-away matches cross-engine; floored at 1 so a
    * nonempty group can never round to a zero rate) and INTEGER-summed
    * for the normalizer, so no float sum depends on row order; the
    * per-group rate is then a fixed-order chain of exact-operand IEEE
    * ops. Other `alpha`s go through `pow` — deterministic within
    * Spark, but `pow` is not cross-engine bit-stable, so only the 0.5
    * configuration carries the oracle.
    *
    * Scale shape: identical to [[domainMix]] — one corpus-scan token
    * agg to group stats, windows only over the #groups-row frame, the
    * rate map broadcast back onto a pure map-filter. */
  def domainMixTemperature(
      docs: DataFrame,
      group: String = "lang",
      alpha: Double = 0.5): DataFrame = {
    val per = docs.select(col("doc_id"), col(group),
      size(words(col("text"))).cast("long").as("n_tokens"),
      (((col("doc_id") % ScrambleP) * ScrambleA) % ScrambleP)
        .cast("double").as("scramble"))
    val gstats = per.groupBy(col(group))
      .agg(sum(col("n_tokens")).as("g_tokens"))
    val weight =
      if (alpha == 0.5) sqrt(col("g_tokens").cast("double"))
      else pow(col("g_tokens").cast("double"), lit(alpha))
    val w = Window.partitionBy()
    val rated = gstats
      .withColumn("w_raw", weight)
      .withColumn("w_max", max(col("w_raw")).over(w))
      .withColumn("q", greatest(lit(1L),
        round((col("w_raw") / col("w_max")) * lit(1048576.0)).cast("long")))
      .withColumn("q_sum", sum(col("q")).over(w))
      .withColumn("t_tokens", sum(col("g_tokens")).over(w))
      .withColumn("rate", least(lit(1.0),
        ((col("q").cast("double") / col("q_sum").cast("double")) *
          col("t_tokens").cast("double")) / col("g_tokens").cast("double")))
      .select(col(group), col("rate"))
    per.join(broadcast(rated), group)
      .withColumn("keep", col("scramble") < col("rate") * lit(ScrambleP.toDouble))
  }

  val qDomainMixTemp: Q = Q(
    "q_domain_mix_temp",
    (s, d) => domainMixTemperature(Tables.documents(s, d))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_before"),
        sum(col("n_tokens")).as("tok_before"),
        min(col("rate")).as("rate"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_after"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("tok_after"))
      .orderBy("lang"),
    Some(s"""WITH per AS (
        SELECT doc_id, lang,
          CAST(len(list_filter(${sqlWords("text")}, t -> t <> '')) AS BIGINT) AS n_tokens,
          CAST(((doc_id % $ScrambleP) * $ScrambleA) % $ScrambleP AS DOUBLE) AS scramble
        FROM documents),
      g AS (SELECT lang, sum(n_tokens) AS g_tokens FROM per GROUP BY 1),
      gw AS (SELECT lang, g_tokens, sqrt(CAST(g_tokens AS DOUBLE)) AS w_raw FROM g),
      g2 AS (SELECT lang, g_tokens,
          GREATEST(1, CAST(round((w_raw / (SELECT max(w_raw) FROM gw))
            * 1048576.0::DOUBLE) AS BIGINT)) AS q
        FROM gw),
      t AS (SELECT sum(q) AS q_sum, sum(g_tokens) AS t_tokens FROM g2),
      rated AS (
        SELECT lang, LEAST(1.0::DOUBLE,
          ((CAST(q AS DOUBLE) / CAST(q_sum AS DOUBLE))
            * CAST(t_tokens AS DOUBLE)) / CAST(g_tokens AS DOUBLE)) AS rate
        FROM g2 CROSS JOIN t)
      SELECT lang,
        count(*) AS n_before,
        CAST(sum(n_tokens) AS BIGINT) AS tok_before,
        min(rate) AS rate,
        CAST(sum(CASE WHEN scramble < rate * 1000000007.0::DOUBLE THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
        CAST(sum(CASE WHEN scramble < rate * 1000000007.0::DOUBLE THEN n_tokens ELSE 0 END) AS BIGINT) AS tok_after
      FROM per JOIN rated USING (lang)
      GROUP BY lang
      ORDER BY lang"""))

  /** H13: curriculum epoch order — quality-decile-major positions
    * (best decile 10 first), seeded-random WITHIN each decile: the
    * curriculum-learning loader order ("clean data first") that
    * composes C15's threshold pass with H10's shuffle machinery. Each
    * doc's 1-based position orders by (10 − decile, scramble, doc_id);
    * per-epoch `seed` reshuffles within deciles while the decile-major
    * structure stands.
    *
    * Scale shape: C15's bounded-histogram decile paint (memo-shared
    * with the standalone row), the H10 scramble as a pure map, ONE
    * packed DECIMAL(38,0) order key — (10−decile)·2^62 + scramble·2^32
    * + doc_id, each component range-disjoint — through the SAME
    * distributed prefix sum as [[shuffleOrder]] (range partition +
    * per-partition offsets; no corpus-wide window). The oracle chains
    * C15's decile CTEs (fragment-shared, the D17 technique) into one
    * row_number over the identical ordering tuple. */
  def curriculumOrder(docs: DataFrame, seed: Long = 0L): DataFrame = {
    require(seed >= 0 && seed < ScrambleP - 1,
      s"seed must be in [0, ${ScrambleP - 1})")
    val mult = ((seed + 1) % ScrambleP) * ScrambleA % ScrambleP
    val dec = TextAnalysis.qualityDeciles(docs).select("doc_id", "decile")
    val keyed = dec.select(col("doc_id"), col("decile"),
        (((col("doc_id") % ScrambleP) * mult) % ScrambleP).as("scramble"))
      .select(col("doc_id"), col("decile"),
        (expr("CAST(10 - decile AS DECIMAL(38,0)) * 4611686018427387904") +
          col("scramble") * lit(4294967296L) +
          when(col("doc_id") >= 0 && col("doc_id") < 4294967296L, col("doc_id"))
            .otherwise(raise_error(concat(
              lit("curriculumOrder: doc_id out of [0, 2^32): "),
              col("doc_id"))))).as("ord_key"))
      .withColumn("one", lit(1L))
    graft.ops.ScaleOps.prefixSum(keyed, "ord_key", "one", "pos")
      .select(col("doc_id"), col("decile"), col("pos"))
      .orderBy("doc_id")
  }

  val qCurriculum: Q = Q(
    "q_curriculum",
    (s, d) => curriculumOrder(Tables.documents(s, d), seed = 42L),
    Some(s"""WITH ${TextAnalysis.sqlDecileCtes("documents")}
      SELECT doc_id, decile,
        row_number() OVER (ORDER BY 10 - decile,
          ((doc_id % $ScrambleP) * ((43 * $ScrambleA) % $ScrambleP)) % $ScrambleP,
          doc_id) AS pos
      FROM deciles
      ORDER BY doc_id"""))

  val all: Seq[Q] =
    Seq(qPackShards, qPackSequences, qPackSequencesBpe, qPackSequencesBytes,
      qPackBestFit,
      qPackBestFitStats, qStratifiedSample,
      qDomainMix, qDomainMixTemp, qShuffleOrder, qWeightedSample,
      qWeightedSampleBpe, qCurriculum)
}
