package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C27 — Unigram-LM tokenizer (Kudo, "Subword Regularization", ACL
  * 2018; the sentencepiece `--model_type=unigram` family): the OTHER
  * production tokenizer next to C13's BPE. Where BPE composes a word
  * bottom-up through learned merges, unigram segments it TOP-DOWN —
  * Viterbi over a piece vocabulary with learned log-probabilities,
  * trained by EM: segment the corpus under the current probabilities,
  * re-estimate probabilities from the segmentation, prune the
  * vocabulary, repeat. Words here are the [a-z]+ runs of
  * [[graft.functions.TextFunctions.words]] (whitespace pre-split
  * stands in for sentencepiece's ▁ word-boundary marker — the same
  * convention every tokenizer row in this tree uses).
  *
  * Scale shape — the C13 trainer contract verbatim: the ONLY
  * corpus-sized work is the one word-frequency aggregation
  * ([[Tokenizer.wordCounts]]); the bounded top-`maxDictWords` dict
  * collects to the driver and the EM loop costs
  * O(emIters × dict × wordLen × maxPieceLen), independent of corpus
  * bytes. Encoding runs the Viterbi automaton once per DISTINCT word
  * (vocabulary-sized typed map, piece table broadcast — the
  * [[Tokenizer.bpeWordCounts]] shape); the corpus side only joins on
  * the word key.
  *
  * Determinism (the trained-pipeline ladder rules): hard-EM (Viterbi
  * counts, the deterministic variant of Kudo's E-step), piece
  * log-probs quantized to 2^20 fixed point via StrictMath.log (a
  * committed table regenerates bit-for-bit on any JVM — Math.log may
  * use platform intrinsics, StrictMath may not), Viterbi tie-break
  * (total score DESC, last piece LONGER first), pruning tie-break
  * (count DESC, piece ASC). Every rule is replayed verbatim by the
  * DuckDB oracle's chained per-position DP CTEs (the E14 technique),
  * so `q_tokenize_ids_uni` hash-checks the ENCODER — DP, tie-breaks,
  * id assignment, word-order reassembly — end to end under the frozen
  * committed table (the H8b posture: production tokenizers are
  * artifacts, not per-corpus fits). The TRAINER, like C13's, is
  * library-only behind UnigramSpec (hand-computed EM, determinism,
  * partitioning invariance, trainer-vs-committed-table equality).
  */
object Unigram {

  /** Reserved id of the out-of-vocabulary single-char step. Training
    * covers every character it sees, so UNK only fires on chars absent
    * from the training corpus. */
  val UnkId = 0

  /** Fixed-point scale for piece log-probs (the H9 2^20 rule). */
  val QScale: Long = 1L << 20

  /** Score of an OOV single-char step: far below any trained piece
    * (ln p > -60 for any piece with count >= 1 in a < 2^60-token
    * corpus), so UNK never outcompetes a real segmentation. */
  val UnkQ: Long = -100L * QScale

  // ----------------------------------------------------------------
  // trainer (driver-side over the bounded dict — the C13 contract)
  // ----------------------------------------------------------------

  /** Learn a unigram piece table from the corpus: (piece, qscore) in
    * id order (ids 1..V; 0 is [[UnkId]]). vocabSize counts ALL pieces
    * including the single-character floor (coverage: every char seen
    * in training stays a piece, so any training-corpus word has a
    * segmentation). */
  def learnPieces(
      docs: DataFrame,
      vocabSize: Int = 160,
      maxPieceLen: Int = 6,
      emIters: Int = 4,
      maxDictWords: Int = 50000): Seq[(String, Long)] = {
    val dict = Tokenizer.wordCounts(docs)
      .orderBy(col("n").desc, col("word"))
      .limit(maxDictWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    learnFromDict(dict, vocabSize, maxPieceLen, emIters)
  }

  /** The EM loop over a (word, freq) dict. Seed = every single char +
    * the top 4×vocabSize substrings (length ≤ maxPieceLen) by
    * frequency-weighted occurrence count; each round Viterbi-segments
    * the dict under the current quantized scores, re-counts pieces
    * from the best paths, floors single chars at count 1 (coverage),
    * drops multi-char pieces that won no occurrences, and prunes to
    * vocabSize by (count DESC, piece ASC). */
  private[graft] def learnFromDict(
      dict: Array[(String, Long)],
      vocabSize: Int,
      maxPieceLen: Int,
      emIters: Int): Seq[(String, Long)] = {
    require(dict.nonEmpty, "unigram trainer: empty dict")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(emIters >= 1, s"emIters must be >= 1, got $emIters")
    val chars = dict.iterator.flatMap(_._1).map(_.toString).toSet
    require(vocabSize >= chars.size + 1,
      s"vocabSize=$vocabSize below the ${chars.size}-character coverage floor")
    def qscores(counts: Map[String, Long]): Map[String, Long] = {
      val total = counts.valuesIterator.sum.toDouble
      counts.map { case (p, c) =>
        p -> math.round(StrictMath.log(c / total) * QScale)
      }
    }
    // seed: frequency-weighted substring counts
    val seed = collection.mutable.HashMap.empty[String, Long]
    for {
      (w, f) <- dict
      i <- 0 until w.length
      l <- 1 to math.min(maxPieceLen, w.length - i)
    } seed.updateWith(w.substring(i, i + l))(c => Some(c.getOrElse(0L) + f))
    val multiSeed = seed.iterator.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(4 * vocabSize)
    var counts: Map[String, Long] =
      (chars.iterator.map(c => c -> seed(c)) ++ multiSeed).toMap
    for (_ <- 1 to emIters) {
      val scores = qscores(counts)
      val next = collection.mutable.HashMap.empty[String, Long]
      for ((w, f) <- dict; p <- viterbiPieces(w, scores, maxPieceLen))
        next.updateWith(p)(c => Some(c.getOrElse(0L) + f))
      val single = chars.iterator.map(c => c -> math.max(next.getOrElse(c, 0L), 1L))
      val multi = next.iterator
        .filter { case (p, c) => p.length >= 2 && c > 0L }.toSeq
        .sortBy { case (p, c) => (-c, p) }
        .take(vocabSize - chars.size)
      counts = (single ++ multi).toMap
    }
    val scores = qscores(counts)
    counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .map { case (p, _) => (p, scores(p)) }
  }

  // ----------------------------------------------------------------
  // encoder (Viterbi — ONE definition for trainer E-step and encoding)
  // ----------------------------------------------------------------

  /** Viterbi best segmentation of `word` under quantized piece scores:
    * maximize Σ qscore over pieces; at every position the candidate
    * set is each vocab piece ending there (length 2..maxPieceLen)
    * plus the always-available single-char step at
    * coalesce(score, [[UnkQ]]). Ties: higher total score, then longer
    * last piece (two same-length last pieces at one position are the
    * same piece — the order is total). Returns piece STRINGS (an OOV
    * char step yields that char). Exactly the DP the oracle's chained
    * CTEs replay. */
  private[graft] def viterbiPieces(
      word: String, scores: Map[String, Long], maxPieceLen: Int): Vector[String] = {
    val n = word.length
    if (n == 0) return Vector.empty
    val best = new Array[Long](n + 1)
    val bLen = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bs = Long.MinValue
      var bl = 0
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        val p = word.substring(i - l, i)
        val s =
          if (l == 1) scores.getOrElse(p, UnkQ)
          else scores.getOrElse(p, Long.MinValue)
        if (s != Long.MinValue) {
          val tot = best(i - l) + s
          if (tot > bs || (tot == bs && l > bl)) { bs = tot; bl = l }
        }
        l += 1
      }
      best(i) = bs
      bLen(i) = bl
      i += 1
    }
    var j = n
    var acc = List.empty[String]
    while (j > 0) {
      val l = bLen(j)
      acc = word.substring(j - l, j) :: acc
      j -= l
    }
    acc.toVector
  }

  /** A reusable word→ids encoder closing over the prebuilt id/score
    * maps — build it ONCE per stage (the corpus encoders call it once
    * per PARTITION), never once per word: at a production-sized
    * vocabulary the O(V) map construction would otherwise multiply
    * every word's O(len × maxPieceLen) Viterbi (a round-13 review
    * finding). Ids are 1-based table positions; OOV chars map to
    * [[UnkId]]. */
  def encoder(
      pieces: Seq[(String, Long)],
      maxPieceLen: Int = DefaultMaxPieceLen): String => Vector[Int] = {
    val ids = pieces.iterator.map(_._1).zipWithIndex
      .map { case (p, i) => p -> (i + 1) }.toMap
    val scores = pieces.toMap
    w => viterbiPieces(w, scores, maxPieceLen).map(p => ids.getOrElse(p, UnkId))
  }

  /** Encode one word to token ids under a piece table — the one-shot
    * convenience over [[encoder]]. */
  def encodeWord(
      word: String,
      pieces: Seq[(String, Long)],
      maxPieceLen: Int = DefaultMaxPieceLen): Vector[Int] =
    encoder(pieces, maxPieceLen)(word)

  /** The piece length bound shared by the trainer default, the frozen
    * table, and the oracle's DP chain (candidate arms per position). */
  val DefaultMaxPieceLen = 6

  /** Longest word the ORACLE's DP chain replays (the chain is static
    * SQL — one CTE per position). The Scala encoder has no limit;
    * a corpus word past this bound drops out of the DuckDB side and
    * the driver gate goes loudly red instead of silently passing. */
  val MaxOracleWordLen = 12

  // ----------------------------------------------------------------
  // corpus-side encoding (the C13b shape)
  // ----------------------------------------------------------------

  /** Tokenize the corpus to trainer-consumable token IDS under a
    * frozen piece table: (doc_id, tokens array<int>, n_tokens),
    * word-order concatenation of per-word Viterbi encodings; wordless
    * docs keep an empty array. Scale shape = [[Tokenizer.tokenizeDocs]]:
    * Viterbi once per DISTINCT word (piece table broadcast), one
    * posexplode + word-key join + per-doc reassembly agg. */
  def tokenizeDocsUnigram(
      docs: DataFrame,
      pieces: Seq[(String, Long)] = FixedPieces,
      maxPieceLen: Int = DefaultMaxPieceLen): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((pieces, maxPieceLen))
    val perWord = docs.select(explode(words(col("text"))).as("word"))
      .distinct().as[String]
      .mapPartitions { it =>
        // one encoder (one O(V) map build) per partition, not per word
        val enc = encoder(bc.value._1, bc.value._2)
        it.map(w => (w, enc(w).toArray))
      }
      .toDF("word", "toks")
    val perDoc = graft.ops.ScaleOps.widenScan(docs, "doc_id")
      .select(col("doc_id"), posexplode(words(col("text"))).as(Seq("wpos", "word")))
      .join(perWord, "word")
      .groupBy("doc_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("wpos"), col("toks")))),
        s => s("toks"))).as("tokens"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("tokens"), array().cast("array<int>")).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Per-word subtoken counts under the unigram table — the fertility
    * side's analogue of [[Tokenizer.bpeWordCounts]]. */
  private def uniWordCounts(
      docs: DataFrame, pieces: Seq[(String, Long)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(pieces)
    docs.select(explode(words(col("text"))).as("word"))
      .distinct().as[String]
      .mapPartitions { it =>
        val enc = encoder(bc.value)
        it.map(w => (w, enc(w).length.toLong))
      }
      .toDF("word", "n_uni")
  }

  /** C19-census extension: BPE vs unigram fertility side by side per
    * source — the comparison that decides which tokenizer family a
    * corpus slice should ship with (Rust et al. ACL'21 measure exactly
    * this across models). Both encoders run at production posture
    * (frozen committed tables); each fertility is one double division
    * of exact integer sums. */
  def tokenizerCompare(
      docs: DataFrame,
      merges: Seq[((String, String), String)] = Tokenizer.FixedMerges,
      pieces: Seq[(String, Long)] = FixedPieces): DataFrame = {
    val bpe = Tokenizer.bpeWordCounts(docs, merges)
    val uni = uniWordCounts(docs, pieces)
    val agg = docs
      .select(col("source"), explode(words(col("text"))).as("word"))
      .join(bpe, "word").join(uni, "word")
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_subtokens")).as("n_bpe"),
        sum(col("n_uni")).as("n_uni"))
    docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(agg, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe"), lit(0L)).as("n_bpe"),
        coalesce(col("n_uni"), lit(0L)).as("n_uni"),
        when(coalesce(col("n_words"), lit(0L)) > 0L,
          coalesce(col("n_bpe"), lit(0L)).cast("double") / col("n_words"))
          .otherwise(lit(0.0)).as("fertility_bpe"),
        when(coalesce(col("n_words"), lit(0L)) > 0L,
          coalesce(col("n_uni"), lit(0L)).cast("double") / col("n_words"))
          .otherwise(lit(0.0)).as("fertility_uni"))
      .orderBy("source")
  }

  // ----------------------------------------------------------------
  // oracle-side replay
  // ----------------------------------------------------------------

  /** The piece table as a DuckDB VALUES list `(piece, id, q)`. Safe to
    * inline: pieces are [a-z]+ (enforced — the corpus words are). */
  def piecesSqlValues(pieces: Seq[(String, Long)]): String = {
    require(pieces.forall(_._1.matches("[a-z]+")),
      "pieces must be [a-z]+ to inline into SQL")
    pieces.zipWithIndex
      .map { case ((p, q), i) => s"('$p', ${i + 1}, $q)" }
      .mkString(", ")
  }

  /** CTE chain replaying [[viterbiPieces]] + id mapping over every
    * distinct word of `tbl` → `wids(word, ids)` (ids = list of BIGINT
    * token ids). One CTE per position (the E14 fixed-iteration
    * technique — every step is integer arithmetic): dp_i keeps ONE row
    * per word (its best prefix-i segmentation: score + '|'-joined id
    * path), chosen by the encoder's exact tie-break (score DESC, last
    * piece length DESC). Candidate arms per position: the length-1
    * step with coalesce(q, UnkQ) / coalesce(id, 0), and one JOIN arm
    * per piece length 2..maxPieceLen. */
  private[queries] def sqlViterbiCtes(
      tbl: String,
      pieces: Seq[(String, Long)],
      maxPieceLen: Int = DefaultMaxPieceLen,
      maxWordLen: Int = MaxOracleWordLen): String = {
    val steps = (1 to maxWordLen).map { i =>
      val arms = (1 to math.min(maxPieceLen, i)).map { l =>
        if (l == 1)
          s"""SELECT d.word, d.score + coalesce(p.q, ${UnkQ}) AS score, 1 AS plen,
                d.path || CAST(coalesce(p.id, ${UnkId}) AS VARCHAR) || '|' AS path
              FROM dp${i - 1} d LEFT JOIN pieces p ON p.piece = substr(d.word, $i, 1)
              WHERE len(d.word) >= $i"""
        else
          s"""SELECT d.word, d.score + p.q AS score, $l AS plen,
                d.path || CAST(p.id AS VARCHAR) || '|' AS path
              FROM dp${i - l} d JOIN pieces p ON p.piece = substr(d.word, ${i - l + 1}, $l)
              WHERE len(d.word) >= $i"""
      }.mkString("\n          UNION ALL ")
      s"""dp$i AS MATERIALIZED (SELECT word, score, path FROM (
          SELECT word, score, path,
            row_number() OVER (PARTITION BY word
              ORDER BY score DESC, plen DESC) AS rn
          FROM ($arms)) z WHERE rn = 1)"""
    }.mkString(",\n      ")
    val finals = (1 to maxWordLen)
      .map(i => s"SELECT word, path FROM dp$i WHERE len(word) = $i")
      .mkString("\n        UNION ALL ")
    s"""pieces(piece, id, q) AS (VALUES ${piecesSqlValues(pieces)}),
      w AS (SELECT DISTINCT unnest(list_filter(${sqlWords("text")}, t -> t <> '')) AS word
        FROM $tbl),
      dp0 AS (SELECT word, CAST(0 AS BIGINT) AS score, '' AS path
        FROM w WHERE len(word) <= $maxWordLen),
      $steps,
      wids AS (SELECT word,
          list_transform(list_filter(string_split(path, '|'), s -> s <> ''),
            s -> CAST(s AS BIGINT)) AS ids
        FROM ($finals))"""
  }

  /** FROZEN piece table: `learnPieces(sf0.001 documents, vocabSize =
    * 40)` (maxPieceLen 6, 4 EM rounds), committed verbatim —
    * `runMain graft.LearnPieces /root/testdata/sf0.001 40` regenerates
    * it bit-for-bit (StrictMath quantized scores; the H8b artifact
    * posture; see [[LearnedPiecesTable]] for why 40, not a
    * production-sized vocabulary). Ids are positions + 1; 0 = UNK. */
  val FixedPieces: Seq[(String, Long)] = LearnedPiecesTable.pieces

  val qTokenizeIdsUni: Q = Q(
    "q_tokenize_ids_uni",
    (s, d) => tokenizeDocsUnigram(Tables.documents(s, d))
      .select(col("doc_id"),
        posexplode(col("tokens")).as(Seq("pos", "token_id")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("token_id").cast("long").as("token_id"))
      .orderBy("doc_id", "pos"),
    Some(s"""WITH ${sqlViterbiCtes("documents", FixedPieces)},
        dwords AS (SELECT doc_id,
            CAST(generate_subscripts(ws, 1) AS BIGINT) AS wpos,
            unnest(ws) AS word
          FROM (SELECT doc_id,
              list_filter(${sqlWords("text")}, t -> t <> '') AS ws
            FROM documents)),
        flat AS (SELECT d.doc_id, d.wpos,
            CAST(generate_subscripts(w.ids, 1) AS BIGINT) AS ipos,
            unnest(w.ids) AS id
          FROM dwords d JOIN wids w USING (word))
      SELECT doc_id,
        CAST(row_number() OVER (PARTITION BY doc_id
          ORDER BY wpos, ipos) - 1 AS BIGINT) AS pos,
        CAST(id AS BIGINT) AS token_id
      FROM flat ORDER BY doc_id, pos"""))

  val qTokenizerCompare: Q = Q(
    "q_tokenizer_compare",
    (s, d) => tokenizerCompare(Tables.documents(s, d)),
    Some(s"""WITH RECURSIVE
        ${Shards.sqlBpeWordCountsFrom("documents", "text")},
        ${sqlViterbiCtes("documents", FixedPieces)},
        un AS (SELECT word, CAST(len(ids) AS BIGINT) AS n_uni FROM wids),
        d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source),
        u AS (SELECT source,
            unnest(list_filter(${sqlWords("text")}, t -> t <> '')) AS word
          FROM documents),
        agg AS (SELECT source,
            CAST(count(*) AS BIGINT) AS n_words,
            CAST(sum(wc.n_sub) AS BIGINT) AS n_bpe,
            CAST(sum(un.n_uni) AS BIGINT) AS n_uni
          FROM u JOIN wc USING (word) JOIN un USING (word)
          GROUP BY source)
      SELECT d.source, d.n_docs,
        CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
        CAST(coalesce(a.n_bpe, 0) AS BIGINT) AS n_bpe,
        CAST(coalesce(a.n_uni, 0) AS BIGINT) AS n_uni,
        CASE WHEN coalesce(a.n_words, 0) > 0
          THEN CAST(a.n_bpe AS DOUBLE) / a.n_words ELSE 0.0 END AS fertility_bpe,
        CASE WHEN coalesce(a.n_words, 0) > 0
          THEN CAST(a.n_uni AS DOUBLE) / a.n_words ELSE 0.0 END AS fertility_uni
      FROM d LEFT JOIN agg a USING (source)
      ORDER BY source"""))

  val all: Seq[Q] = Seq(qTokenizeIdsUni, qTokenizerCompare)
}
