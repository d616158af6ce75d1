package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C28 — BYTE-FALLBACK tokenization: UNK-free ids that round-trip ANY
  * input (the GPT-2 posture; the r13 verdict's named gap: C13b's id
  * table is alphabet+merges and C27 steps OOV chars through UNK 0 —
  * a production LOADER wants every byte representable so no input is
  * ever lost or collapsed).
  *
  * Id space, fixed forever by the committed merge table:
  *   0..255   the raw bytes (a byte's token id IS its value);
  *   256      the run marker [[Tokenizer.EndOfWord]];
  *   257+rank each merge's output symbol (first rank keeps the id on
  *            a duplicate string — [[Tokenizer.vocab]]'s rule).
  *
  * Pre-tokenization preserves EVERYTHING: text splits into maximal
  * runs of non-whitespace / whitespace (`\S+|\s+` — the GPT-2 trick
  * of making separators first-class tokens rather than discarding
  * them), each run's UTF-8 bytes seed the merge automaton ([a-z]
  * bytes as their letter symbols — the merge tables' alphabet; every
  * other byte as a `<0xHH>` symbol that no merge touches), and the
  * run marker closes each run. decode(encode(text)) == text BYTE FOR
  * BYTE on any input — adversarial non-ASCII included
  * (ByteTokenizerSpec) — because every symbol's string maps back to
  * its exact bytes and run boundaries erase to nothing.
  *
  * The merge automaton is [[Tokenizer.mergeLoop]] — the SAME loop
  * C13b runs, seeded with byte symbols instead of chars, so the two
  * tokenizers cannot drift on merge semantics; on pure [a-z] words
  * the encodings coincide (spec-pinned). The oracle replays the whole
  * path on the ASCII corpus (chars == bytes there): run splitting,
  * byte-symbol seeding, the H8b recursive-CTE automaton, the 321-row
  * id table, and run-order reassembly hash in one row.
  *
  * Scale shape — the C13/H8b encoder split, unchanged: the automaton
  * runs once per DISTINCT run (vocabulary-sized typed map, rank + id
  * tables broadcast; whitespace runs collapse to a handful of
  * distinct keys), the corpus side is one posexplode + run-key join +
  * per-doc reassembly agg. The reassembly groupBy is the one
  * corpus-sized shuffle — the output is a per-doc array, same width
  * as the text.
  */
object ByteTokenizer {

  /** A run's seed symbols: UTF-8 bytes, [a-z] as letter symbols (the
    * merge alphabet), every other byte as `<0xHH>` (uppercase hex —
    * no merge's symbols contain `<0x`, so fallback bytes pass through
    * the automaton untouched). */
  private[graft] def byteSymbols(run: String): Vector[String] =
    run.getBytes(java.nio.charset.StandardCharsets.UTF_8).toVector.map { b =>
      val u = b & 0xff
      if (u >= 'a'.toInt && u <= 'z'.toInt) u.toChar.toString
      else f"<0x$u%02X>"
    }

  /** The byte-fallback id table for a merge table: bytes 0..255 at
    * their own values, the run marker at 256, merge outputs from 257
    * in rank order (first rank keeps a duplicated string's id). */
  def vocabBytes(merges: Seq[((String, String), String)]): Seq[(String, Int)] = {
    val bytes = (0 until 256).map { u =>
      (if (u >= 'a'.toInt && u <= 'z'.toInt) u.toChar.toString
       else f"<0x$u%02X>") -> u
    }
    val rest = (Tokenizer.EndOfWord +: merges.map(_._2)).zipWithIndex
      .map { case (s, i) => s -> (256 + i) }
    val seen = collection.mutable.HashSet.empty[String]
    (bytes ++ rest).filter { case (s, _) => seen.add(s) }
  }

  /** [[vocabBytes]] as a DuckDB VALUES list `(sym, id)`. Safe to
    * inline: every symbol is [a-z], `<0xHH>`, `</w>`, or a merge
    * output over those — no quote characters anywhere (the quote BYTE
    * 0x27 is the symbol `<0x27>`). */
  def vocabBytesSqlValues(merges: Seq[((String, String), String)]): String =
    vocabBytes(merges).map { case (s, i) => s"('$s', $i)" }.mkString(", ")

  /** Encode one run: byte symbols + run marker through the SHARED
    * merge automaton. */
  def encodeRun(
      run: String, ranks: Map[(String, String), Int]): Vector[String] =
    Tokenizer.mergeLoop(byteSymbols(run) :+ Tokenizer.EndOfWord, ranks)

  /** Decode token ids back to the exact original text — the
    * round-trip proof surface. Every symbol's string is its bytes via
    * [[symbolBytes]]' left-to-right segmentation: run markers erase,
    * `<0xHH>` escapes emit their byte, literal characters ([a-z]
    * letters) emit their UTF-8 bytes — so merge outputs that MIX
    * letters, markers, and hex escapes (the byte-learned tables
    * produce such symbols; a round-14 advisor finding against the old
    * keep-only-hex-matches branch) decode exactly. */
  def decode(tokens: Seq[Int], merges: Seq[((String, String), String)]): String = {
    val bySym = vocabBytes(merges).map(_.swap).toMap
    val bytes = tokens.flatMap(id => symbolBytes(bySym(id)))
    new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** A symbol's exact bytes, by unambiguous left-to-right
    * segmentation into run markers (zero bytes), `<0xHH>` escapes
    * (their byte), and literal characters (their UTF-8 bytes). The
    * segmentation is total over anything a merge table over the seed
    * alphabet can produce — a literal `<` never arises as a seed
    * symbol (the 0x3C byte seeds as `<0x3C>`), so any `<` that opens
    * neither the marker nor a well-formed escape is a malformed
    * CUSTOM merges table and is rejected loudly rather than decoded
    * by guesswork (the validation arm of the advisor ask). */
  private[queries] def symbolBytes(sym: String): Seq[Byte] = {
    def hexAt(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var i = 0
    while (i < sym.length) {
      if (sym.startsWith(Tokenizer.EndOfWord, i)) i += Tokenizer.EndOfWord.length
      else if (sym.charAt(i) == '<') {
        val ok = i + 5 < sym.length && sym.charAt(i + 1) == '0' &&
          sym.charAt(i + 2) == 'x' && sym.charAt(i + 5) == '>' &&
          hexAt(sym.charAt(i + 3)) >= 0 && hexAt(sym.charAt(i + 4)) >= 0
        require(ok, s"ByteTokenizer: malformed symbol '$sym' — '<' must open " +
          s"'${Tokenizer.EndOfWord}' or a '<0xHH>' escape (custom merges " +
          "tables must build outputs from the seed alphabet)")
        out += ((hexAt(sym.charAt(i + 3)) << 4) | hexAt(sym.charAt(i + 4))).toByte
        i += 6
      } else {
        out ++= sym.charAt(i).toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        i += 1
      }
    }
    out.toSeq
  }

  /** C30 — learn `merges` BPE merges over the BYTE-SYMBOL alphabet
    * from the corpus's actual runs: digits, punctuation, casing, and
    * whitespace runs all enter the dict (as their `<0xHH>`/letter
    * seeds), so the learned table compresses NON-letter text instead
    * of falling back to raw byte ids everywhere (the r14 verdict's
    * top ask — the GPT-2 trainer posture, where the merge alphabet IS
    * the byte alphabet). The trainer is [[Tokenizer.learnFromSymbolSeqs]]
    * — the SAME incremental-heap loop as C13, seeded with
    * [[byteSymbols]] runs instead of char words, so training and
    * encoding share one merge semantics end to end.
    *
    * Scale shape — the C13 contract verbatim: the only corpus-sized
    * work is one run-frequency aggregation (map-side combinable,
    * vocabulary-sized output); the top-`maxDictRuns` dict collects to
    * the driver (bounded — runs follow the same Zipf mass as words)
    * and the merge loop costs O(merges × dict), independent of corpus
    * bytes. Determinism: (count DESC, run ASC) dict cut and the
    * trainer's own (count DESC, pair ASC) selection — engine-free
    * integer/string rules, reproducible cluster to cluster. */
  def learnByteMerges(
      docs: DataFrame,
      merges: Int,
      maxDictRuns: Int = 50000): Seq[((String, String), String)] = {
    val dict = docs.select(explode(runsCol).as("run"))
      .groupBy("run").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("run"))
      .limit(maxDictRuns)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    Tokenizer.learnFromSymbolSeqs(
      dict.map { case (run, n) =>
        (byteSymbols(run) :+ Tokenizer.EndOfWord, n) },
      merges)
  }

  /** LEARNED byte-level merge table: the first 100 merges of
    * `learnByteMerges(sf0.1 documents, budget = 512)`, committed
    * verbatim (`runMain graft.LearnByteMerges` reproduces it
    * bit-for-bit — the trainer is deterministic). The corpus's runs
    * are its 31 words plus the single-space separator, so the trainer
    * exhausts at 108 merges; depth 100 is the deepest committed
    * prefix that keeps corpus action (3 runs still multi-token,
    * run-frequency-weighted corpus fertility 0.403 tokens/byte — the
    * trainer's printed profile) while the oracle's recursive-CTE
    * replay still walks several merge steps per run. The FIRST
    * learned merge is (`<0x20>`, `</w>`) — the space run collapsing
    * to ONE token — the concrete non-letter win the letter-trained
    * table could never produce (it priced every space at 2 tokens). */
  val LearnedByteMerges: Seq[((String, String), String)] =
    LearnedByteMergesTable.pairs

  /** The `\\S+|\\s+` run split as a column — ONE definition for the
    * tokenizer, the run-count census, and H8c's packing weight. */
  private[graft] def runsCol: org.apache.spark.sql.Column =
    expr(raw"regexp_extract_all(text, '\\S+|\\s+', 0)")

  /** Per-DISTINCT-run byte-fallback token counts (run, n_subtokens) —
    * the C13 bpeWordCounts shape on runs: the automaton runs once per
    * distinct run, the corpus side joins on the run key (H8c's
    * packing weight). */
  def byteRunCounts(
      docs: DataFrame,
      merges: Seq[((String, String), String)] = Tokenizer.FixedMerges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = spark.sparkContext.broadcast(
      merges.map(_._1).zipWithIndex.toMap)
    docs.select(explode(runsCol).as("run"))
      .distinct().as[String]
      .map(r => (r, encodeRun(r, ranks.value).length.toLong))
      .toDF("run", "n_subtokens")
  }

  /** Tokenize ANY text to UNK-free trainer ids:
    * (doc_id, tokens array<int>, n_tokens) — run-order concatenation
    * of each whitespace/non-whitespace run's byte-fallback encoding.
    * Null text yields an empty array (nothing to round-trip). */
  def tokenizeDocsBytes(
      docs: DataFrame,
      merges: Seq[((String, String), String)] = Tokenizer.FixedMerges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = spark.sparkContext.broadcast(
      merges.map(_._1).zipWithIndex.toMap)
    val ids = spark.sparkContext.broadcast(vocabBytes(merges).toMap)
    val perRun = docs.select(explode(runsCol).as("run"))
      .distinct().as[String]
      .map(r => (r, encodeRun(r, ranks.value).map(ids.value(_)).toArray))
      .toDF("run", "toks")
    val perDoc = graft.ops.ScaleOps.widenScan(docs, "doc_id")
      .select(col("doc_id"), posexplode(runsCol).as(Seq("rpos", "run")))
      .join(perRun, "run")
      .groupBy("doc_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("rpos"), col("toks")))),
        s => s("toks"))).as("tokens"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("tokens"), array().cast("array<int>")).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** C28's driver row: the byte-fallback output token by token (the
    * C13b long form), oracle-replayed end to end on the ASCII corpus
    * where chars == bytes: `\S+|\s+` run split, byte-symbol seeding
    * (`<0xHH>` via ascii()/to_hex), the SAME recursive-CTE automaton
    * as H8b/C13b, the full 321-row id table, run-order reassembly. */
  /** Oracle-side CTE chain replaying the byte-fallback encoder over
    * `tbl`: `\\S+|\\s+` run split (`druns (doc_id, rpos, run)`),
    * byte-symbol seeding via ascii()/to_hex (ASCII corpus: chars ==
    * bytes), and the SAME recursive merge automaton as H8b/C13b →
    * `rseq (run, fseq)`. Must sit under `WITH RECURSIVE`. Shared by
    * the C28 id row and H8c's byte-token packing (the D17 one-fragment
    * discipline). */
  private[queries] def sqlByteRunSeqCtes(
      tbl: String,
      merges: Seq[((String, String), String)] = Tokenizer.FixedMerges): String =
    s"""m(rank, l, r) AS (VALUES ${Tokenizer.mergesSqlValues(merges)}),
        druns AS (SELECT doc_id,
            CAST(generate_subscripts(rs, 1) AS BIGINT) AS rpos,
            unnest(rs) AS run
          FROM (SELECT doc_id,
              regexp_extract_all(text, '\\S+|\\s+') AS rs
            FROM $tbl)),
        dr AS (SELECT DISTINCT run FROM druns),
        enc AS (
          SELECT run,
            list_reduce(list_prepend('', list_transform(
              regexp_extract_all(run, '(?s).'),
              c -> '|' || CASE WHEN c BETWEEN 'a' AND 'z' AND ascii(c) >= 97
                  THEN c
                  ELSE '<0x' || lpad(upper(to_hex(ascii(c))), 2, '0') || '>'
                END || '|')), (a, b) -> a || b) || '|</w>|' AS seq,
            0 AS step
          FROM dr
          UNION ALL
          SELECT e.run, replace(e.seq, b.pat, b.rep) AS seq, e.step + 1 AS step
          FROM enc e, LATERAL (
            SELECT '|' || m.l || '||' || m.r || '|' AS pat,
                   '|' || m.l || m.r || '|' AS rep
            FROM m
            WHERE contains(e.seq, '|' || m.l || '||' || m.r || '|')
            ORDER BY m.rank LIMIT 1) b),
        rseq AS (SELECT run, arg_max(seq, step) AS fseq
          FROM enc GROUP BY run)"""

  private def tokenizeIdsRow(
      name: String, merges: Seq[((String, String), String)]): Q = Q(
    name,
    (s, d) => tokenizeDocsBytes(Tables.documents(s, d), merges)
      .select(col("doc_id"),
        posexplode(col("tokens")).as(Seq("pos", "token_id")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("token_id").cast("long").as("token_id"))
      .orderBy("doc_id", "pos"),
    Some(s"""WITH RECURSIVE
        ${sqlByteRunSeqCtes("documents", merges)},
        vocab(sym, id) AS (VALUES ${vocabBytesSqlValues(merges)}),
        rsyms AS (SELECT run,
            list_filter(string_split(fseq, '|'), s -> s <> '') AS syms
          FROM rseq),
        rsym AS (SELECT run,
            CAST(generate_subscripts(syms, 1) AS BIGINT) AS ipos,
            unnest(syms) AS sym
          FROM rsyms),
        rid AS (SELECT run, ipos, v.id FROM rsym JOIN vocab v USING (sym)),
        flat AS (SELECT d.doc_id, d.rpos, r.ipos, r.id
          FROM druns d JOIN rid r USING (run))
      SELECT doc_id,
        CAST(row_number() OVER (PARTITION BY doc_id
          ORDER BY rpos, ipos) - 1 AS BIGINT) AS pos,
        CAST(id AS BIGINT) AS token_id
      FROM flat ORDER BY doc_id, pos"""))

  val qTokenizeIdsBytes: Q = tokenizeIdsRow(
    "q_tokenize_ids_bytes", Tokenizer.FixedMerges)

  /** C30's id row: the SAME plumbing as C28's, under the byte-LEARNED
    * table — digits, punctuation, casing, and whitespace runs now hit
    * learned merges instead of falling back to raw byte ids, and the
    * oracle replays run split → byte seeding → the recursive-CTE
    * automaton over the learned VALUES → the 357-row id table →
    * reassembly in one hash. */
  val qTokenizeIdsBytesLearned: Q = tokenizeIdsRow(
    "q_tokenize_ids_bytes_learned", LearnedByteMerges)

  /** Per-doc BYTE fertility under a merge table:
    * (doc_id, n_bytes, n_tokens, fertility = tokens/byte) — the C19
    * census re-based to the loader's honest denominator (UTF-8 bytes,
    * whitespace included). Under the byte-LEARNED table real text
    * prices WELL below 1 token/byte (the letter-trained table priced
    * every non-letter byte at >= 1 — spaces at 2); the committed
    * table's corpus-wide mean is 0.403 tok/byte (LearnByteMerges'
    * printed profile). */
  def byteFertility(
      docs: DataFrame,
      merges: Seq[((String, String), String)] = LearnedByteMerges): DataFrame = {
    val per = docs.select(col("doc_id"), explode(runsCol).as("run"))
      .join(byteRunCounts(docs, merges), "run")
      .groupBy("doc_id").agg(sum(col("n_subtokens")).as("n_tokens"))
    docs.select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bytes"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .withColumn("fertility",
        when(col("n_bytes") === 0L, lit(0.0))
          .otherwise(col("n_tokens").cast("double") / col("n_bytes").cast("double")))
      .orderBy("doc_id")
  }

  val qBpeFertilityBytes: Q = Q(
    "q_bpe_fertility_bytes",
    (s, d) => byteFertility(Tables.documents(s, d)),
    Some(s"""WITH RECURSIVE
        ${sqlByteRunSeqCtes("documents", LearnedByteMerges)},
        rcount AS (SELECT run,
            CAST(len(list_filter(string_split(fseq, '|'), s -> s <> ''))
              AS BIGINT) AS n_sub
          FROM rseq),
        per AS (SELECT d.doc_id, CAST(sum(r.n_sub) AS BIGINT) AS n_tokens
          FROM druns d JOIN rcount r USING (run) GROUP BY 1)
      SELECT d.doc_id,
        CAST(strlen(d.text) AS BIGINT) AS n_bytes,
        coalesce(p.n_tokens, 0::BIGINT) AS n_tokens,
        CASE WHEN strlen(d.text) = 0 THEN 0.0::DOUBLE
          ELSE CAST(coalesce(p.n_tokens, 0) AS DOUBLE) /
            CAST(strlen(d.text) AS DOUBLE) END AS fertility
      FROM documents d LEFT JOIN per p USING (doc_id)
      ORDER BY doc_id"""))

  val all: Seq[Q] =
    Seq(qTokenizeIdsBytes, qTokenizeIdsBytesLearned, qBpeFertilityBytes)
}
