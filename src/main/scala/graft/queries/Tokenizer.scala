package graft.queries

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** BPE tokenizer training over the corpus (SURVEY.md §2 C13) — the
  * vocabulary-induction step an LLM pipeline runs before token
  * counting/packing means anything (Sennrich, Haddow & Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016).
  *
  * Scale shape — the sentencepiece/fastBPE trainer shape, not a naive
  * corpus loop: the ONLY corpus-sized work is one word-frequency
  * aggregation (map-side combinable, vocabulary-sized output). The
  * top-`maxDictWords` dict then collects to the driver — bounded the
  * same way [[graft.ops.ConnectedComponents]]' local finish is: at any
  * corpus scale the top 50k words cover ~99.9% of token mass, the
  * collect is a few MB, and the merge loop's cost is
  * O(merges × dict size), independent of corpus bytes. Encoding
  * ([[bpeStats]]) runs the imperative merge automaton once per
  * DISTINCT word (a vocabulary-sized typed map with the rank table
  * broadcast — per-row imperative logic, the documented last-resort
  * case), and the corpus only joins on the word key.
  *
  * Determinism: merge selection breaks ties by (count DESC, pair
  * lexicographic ASC); encoding merges the lowest-rank pair first,
  * all adjacent occurrences left-to-right — both engine-free integer/
  * string rules, so the merge table and every encoding are
  * reproducible run to run and cluster to cluster. Library-only like
  * the trained-IVF fit: the iterative merge loop is not
  * SQL-expressible, so this ships behind TokenizerSpec (hand-computed
  * classic example) instead of a DuckDB oracle. */
object Tokenizer {

  /** End-of-word marker (Sennrich '16): lets a merge distinguish
    * word-final from word-internal contexts. */
  val EndOfWord = "</w>"

  /** Word-frequency dict: the one corpus-sized aggregation (shared
    * with the C27 unigram trainer — ONE dict definition). */
  private[queries] def wordCounts(docs: DataFrame): DataFrame =
    // widenScan before the tokenize+explode map (guide §2.5)
    graft.ops.ScaleOps.widenScan(docs, "doc_id").select(explode(words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Learn `merges` BPE merges from the corpus; returns them in rank
    * order as ((left, right), merged). */
  def bpeLearnMerges(
      docs: DataFrame,
      merges: Int,
      maxDictWords: Int = 50000): Seq[((String, String), String)] = {
    // bounded dict: top words by mass, deterministic tie-break
    val dict = wordCounts(docs)
      .orderBy(col("n").desc, col("word"))
      .limit(maxDictWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    learnFromDict(dict, merges)
  }

  /** Heap priority: highest count first, ties by pair lexicographic
    * ASC (reversed string compares make the lexicographically smaller
    * pair the "max"). */
  private[this] val bestPairOrd: Ordering[(Long, (String, String))] =
    new Ordering[(Long, (String, String))] {
      def compare(a: (Long, (String, String)), b: (Long, (String, String))): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val l = b._2._1.compareTo(a._2._1)
          if (l != 0) l else b._2._2.compareTo(a._2._2)
        }
      }
    }

  /** Adjacent-pair multiset of one symbol sequence. */
  private def pairBag(s: Vector[String]): collection.mutable.HashMap[(String, String), Int] = {
    val m = collection.mutable.HashMap.empty[(String, String), Int]
    var i = 0
    while (i < s.length - 1) {
      m.updateWith((s(i), s(i + 1)))(c => Some(c.getOrElse(0) + 1))
      i += 1
    }
    m
  }

  /** The driver-side merge loop with the standard INCREMENTAL pair
    * bookkeeping (the sentencepiece/fastBPE scheme): global pair
    * counts, a pair → {word → occurrences} index, and a lazy-deletion
    * max-heap over (count, pair). Each merge touches only the words
    * that CONTAIN the merged pair and re-derives count deltas from
    * each touched word's before/after pair multisets — so every
    * overlap edge case ("aaaa") inherits [[mergeAll]]'s exact
    * left-to-right semantics, and a merge costs
    * O(affected words × word length + log-heap), not
    * O(dict × word length). A 32k-merge vocabulary over a 50k dict
    * trains in minutes instead of re-counting ~5×10^8 pairs per merge.
    * Selection is IDENTICAL to the naive recount loop — highest count,
    * ties by pair lexicographic order — pinned by TokenizerSpec's
    * incremental-vs-naive differential. */
  private[graft] def learnFromDict(
      dict: Array[(String, Long)], merges: Int): Seq[((String, String), String)] =
    learnFromSymbolSeqs(
      dict.map { case (w, n) => (w.map(_.toString).toVector :+ EndOfWord, n) },
      merges)

  /** The incremental-heap trainer over arbitrary SEED SYMBOL
    * sequences — factored from the char-seeded [[learnFromDict]] so
    * the byte-level trainer ([[ByteTokenizer.learnByteMerges]]), whose
    * dict entries are byte-symbol runs rather than words, runs the
    * IDENTICAL selection/bookkeeping loop (the C13/C28 one-definition
    * discipline carried to TRAINING: the two trainers cannot drift on
    * merge semantics any more than the two encoders can). */
  private[graft] def learnFromSymbolSeqs(
      dict: Array[(Vector[String], Long)], merges: Int): Seq[((String, String), String)] = {
    import collection.mutable
    val syms: Array[Vector[String]] = dict.map(_._1)
    val freq: Array[Long] = dict.map(_._2)
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.HashMap[Int, Int]]
    val heap = mutable.PriorityQueue.empty[(Long, (String, String))](bestPairOrd)
    for (wi <- syms.indices) {
      for ((p, c) <- pairBag(syms(wi))) {
        pairCounts.updateWith(p)(x => Some(x.getOrElse(0L) + c.toLong * freq(wi)))
        occ.getOrElseUpdate(p, mutable.HashMap.empty).update(wi, c)
      }
    }
    pairCounts.foreach { case (p, c) => heap.enqueue((c, p)) }
    val out = Vector.newBuilder[((String, String), String)]
    var k = 0
    var exhausted = false
    while (k < merges && !exhausted) {
      // lazy deletion: every CURRENT count has a live heap entry (one
      // is pushed at every update), so discarding stale tops until one
      // matches pairCounts yields the true (count desc, pair asc) max
      var best: (String, String) = null
      while (best == null && heap.nonEmpty) {
        val (c, p) = heap.dequeue()
        if (pairCounts.get(p).contains(c)) best = p
      }
      if (best == null) exhausted = true
      else {
        val merged = best._1 + best._2
        out += ((best, merged))
        val affected = occ.get(best).map(_.keysIterator.toArray).getOrElse(Array.empty)
        for (wi <- affected) {
          val before = syms(wi)
          val after = mergeAll(before, best, merged)
          syms(wi) = after
          val oldBag = pairBag(before)
          val newBag = pairBag(after)
          for (p <- oldBag.keySet ++ newBag.keySet) {
            val d = newBag.getOrElse(p, 0) - oldBag.getOrElse(p, 0)
            if (d != 0) {
              val nc = pairCounts.getOrElse(p, 0L) + d.toLong * freq(wi)
              if (nc <= 0L) pairCounts.remove(p)
              else { pairCounts.update(p, nc); heap.enqueue((nc, p)) }
            }
            val nOcc = newBag.getOrElse(p, 0)
            if (nOcc == 0)
              occ.get(p).foreach { m => m.remove(wi); if (m.isEmpty) occ.remove(p) }
            else occ.getOrElseUpdate(p, mutable.HashMap.empty).update(wi, nOcc)
          }
        }
        k += 1
      }
    }
    out.result()
  }

  /** The naive recount loop the incremental trainer must match: full
    * pair recount + argmax every merge. Kept as the differential
    * reference for TokenizerSpec (and the honest statement of the
    * selection rule). */
  private[graft] def learnFromDictNaive(
      dict: Array[(String, Long)], merges: Int): Seq[((String, String), String)] =
    learnFromSymbolSeqsNaive(
      dict.map { case (w, n) => (w.map(_.toString).toVector :+ EndOfWord, n) },
      merges)

  /** Naive recount loop over arbitrary seed symbol sequences — the
    * differential reference for [[learnFromSymbolSeqs]] (both the char
    * and the byte trainer differentials pin against it). */
  private[graft] def learnFromSymbolSeqsNaive(
      dict: Array[(Vector[String], Long)], merges: Int): Seq[((String, String), String)] = {
    var syms: Array[(Vector[String], Long)] = dict
    val out = Vector.newBuilder[((String, String), String)]
    var k = 0
    var exhausted = false
    while (k < merges && !exhausted) {
      val counts = collection.mutable.HashMap.empty[(String, String), Long]
      for ((s, n) <- syms; i <- 0 until s.length - 1)
        counts.updateWith((s(i), s(i + 1)))(c => Some(c.getOrElse(0L) + n))
      if (counts.isEmpty) exhausted = true
      else {
        // highest count; ties broken by pair lexicographic order
        val best = counts.keys.minBy { p => (-counts(p), p._1, p._2) }
        val merged = best._1 + best._2
        out += ((best, merged))
        syms = syms.map { case (s, n) => (mergeAll(s, best, merged), n) }
        k += 1
      }
    }
    out.result()
  }

  /** All adjacent occurrences of `pair`, left-to-right (non-overlapping). */
  private def mergeAll(
      s: Vector[String], pair: (String, String), merged: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == pair._1 && s(i + 1) == pair._2) {
        b += merged; i += 2
      } else { b += s(i); i += 1 }
    }
    b.result()
  }

  /** The learned merge table as a frame: (rank, left, right, merged). */
  def bpeLearn(docs: DataFrame, merges: Int, maxDictWords: Int = 50000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeLearnMerges(docs, merges, maxDictWords).zipWithIndex
      .map { case (((l, r), m), i) => (i.toLong, l, r, m) }
      .toDF("rank", "left", "right", "merged")
  }

  /** Encode one word with a rank table: repeatedly merge the
    * LOWEST-rank adjacent pair (all occurrences) until none applies —
    * the standard greedy BPE encoder. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] =
    mergeLoop(word.map(_.toString).toVector :+ EndOfWord, ranks)

  /** The greedy merge automaton over an arbitrary INITIAL symbol
    * sequence — factored from [[encodeWord]] so the byte-fallback
    * encoder ([[ByteTokenizer]]), whose seed symbols are bytes rather
    * than chars, runs the IDENTICAL loop (one definition — the two
    * tokenizers cannot drift on merge semantics). */
  private[queries] def mergeLoop(
      init: Vector[String], ranks: Map[(String, String), Int]): Vector[String] = {
    var s = init
    var done = false
    while (!done && s.length > 1) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < s.length - 1) {
        val r = ranks.getOrElse((s(i), s(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (s(i), s(i + 1)) }
        i += 1
      }
      if (best == null) done = true
      else s = mergeAll(s, best, best._1 + best._2)
    }
    s
  }

  /** Per-DISTINCT-word BPE token counts under a merge table:
    * (word, n_subtokens). The merge automaton runs once per distinct
    * word (vocabulary-sized typed map, rank table broadcast) — the
    * encoder shape [[bpeStats]] and the token-weighted packing twin
    * ([[Shards.packSequencesBpe]]) share. */
  def bpeWordCounts(
      docs: DataFrame,
      merges: Seq[((String, String), String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = spark.sparkContext.broadcast(
      merges.map(_._1).zipWithIndex.toMap)
    docs.select(explode(words(col("text"))).as("word"))
      .distinct().as[String]
      .map(w => (w, encodeWord(w, ranks.value).length.toLong))
      .toDF("word", "n_subtokens")
  }

  /** Per-doc tokenizer-fertility stats under a learned merge table:
    * (doc_id, n_words, n_bpe_tokens, fertility = bpe/words). The merge
    * automaton runs once per DISTINCT word (vocabulary-sized typed
    * map, rank table broadcast); the corpus side only joins on the
    * word key and aggregates. */
  def bpeStats(
      docs: DataFrame,
      merges: Seq[((String, String), String)]): DataFrame = {
    val perWord = bpeWordCounts(docs, merges)
    graft.ops.ScaleOps.widenScan(docs, "doc_id")
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .join(perWord, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_subtokens")).as("n_bpe_tokens"))
      .withColumn("fertility",
        col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))
      .orderBy("doc_id")
  }

  /** A FROZEN 64-merge table, learned once by [[bpeLearnMerges]] on the
    * sf0.001 documents table (`bpeLearnMerges(docs, 64)`, committed
    * verbatim — rerunning the trainer reproduces it bit-for-bit). This
    * is the production posture for token-weighted packing/sampling: a
    * trainer consumes counts under a FIXED, pre-trained tokenizer
    * (GPT-2's vocab, LLaMA's, …), not one relearned per corpus — so the
    * table is an artifact, like a model checkpoint, and the oracle can
    * replay it. Pairs are in rank order; merged symbol = left + right. */
  val FixedMerges: Seq[((String, String), String)] = Seq(
    ("e", "r"), ("e", EndOfWord), ("n", EndOfWord), ("o", "r"),
    ("t", EndOfWord), ("er", EndOfWord), ("o", "w"), ("ow", EndOfWord),
    ("l", "u"), ("i", "n"), ("y", EndOfWord), ("a", "r"),
    ("p", "ar"), ("g", EndOfWord), ("a", "s"), ("h", EndOfWord),
    ("a", EndOfWord), ("s", "t"), ("a", "t"), ("a", "n" + EndOfWord),
    ("c", "an" + EndOfWord), ("s", "can" + EndOfWord), ("c", "o"),
    ("co", "lu"), ("colu", "m"), ("colum", "n" + EndOfWord),
    ("d", "ow" + EndOfWord), ("in", "dow" + EndOfWord),
    ("w", "indow" + EndOfWord), ("d", "er" + EndOfWord),
    ("or", "der" + EndOfWord), ("or", "t" + EndOfWord),
    ("s", "ort" + EndOfWord), ("p", EndOfWord), ("par", "t" + EndOfWord),
    ("u", "p" + EndOfWord), ("a", "g"), ("ag", "g" + EndOfWord),
    ("a", "lu"), ("alu", "e" + EndOfWord), ("v", "alue" + EndOfWord),
    ("in", "e" + EndOfWord), ("l", "ine" + EndOfWord),
    ("e", "y" + EndOfWord), ("k", "ey" + EndOfWord),
    ("i", "n" + EndOfWord), ("j", "o"), ("jo", "in" + EndOfWord),
    ("er", "g"), ("erg", "e" + EndOfWord), ("m", "erge" + EndOfWord),
    ("er", "y" + EndOfWord), ("g", "r"), ("gr", "o"),
    ("gro", "up" + EndOfWord), ("q", "u"), ("qu", "ery" + EndOfWord),
    ("c", "t"), ("ct", "or"), ("ctor", EndOfWord),
    ("e", "ctor" + EndOfWord), ("v", "ector" + EndOfWord),
    ("as", "h" + EndOfWord), ("h", "ash" + EndOfWord)
  ).map { case (l, r) => ((l, r), l + r) }

  /** LEARNED merge table at production-ish replay depth: the first 96
    * merges of `bpeLearnMerges(sf0.1 documents, budget = 512)`,
    * committed verbatim (`runMain graft.LearnMerges` reproduces it
    * bit-for-bit — the trainer is deterministic). The budget of 512
    * is NOT reachable on this corpus: the synthetic vocabulary is 31
    * distinct words, so the trainer exhausts at 107 merges with every
    * word a single symbol — fertility 1.0 everywhere, which would
    * leave the fertility join/census with nothing to verify. Depth 96
    * is the deepest committed prefix that keeps corpus action (mean
    * fertility 1.355, 5 words still multi-token) while exercising the
    * oracle's recursive-CTE encoder replay at ~6 merge steps per word
    * — the realistic-depth proof the 64-merge [[FixedMerges]] row
    * doesn't give. */
  val LearnedMerges: Seq[((String, String), String)] = Seq(
    ("e", "</w>"), ("e", "r"), ("i", "n"), ("o", "r"),
    ("s", "t"), ("er", "</w>"), ("o", "w"), ("ow", "</w>"),
    ("t", "a"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("n", "</w>"), ("g", "</w>"), ("t", "</w>"), ("h", "</w>"),
    ("y", "</w>"), ("p", "</w>"), ("u", "p</w>"), ("k", "</w>"),
    ("par", "k</w>"), ("s", "park</w>"), ("d", "ow</w>"), ("in", "dow</w>"),
    ("w", "indow</w>"), ("er", "g"), ("erg", "e</w>"), ("m", "erge</w>"),
    ("b", "l"), ("bl", "e</w>"), ("ta", "ble</w>"), ("c", "o"),
    ("co", "lu"), ("colu", "m"), ("colum", "n</w>"), ("c", "t"),
    ("ct", "or"), ("ctor", "</w>"), ("e", "ctor</w>"), ("v", "ector</w>"),
    ("a", "m"), ("am", "</w>"), ("e", "am</w>"), ("r", "eam</w>"),
    ("st", "ream</w>"), ("a", "lu"), ("alu", "e</w>"), ("v", "alue</w>"),
    ("a", "ta"), ("ata", "</w>"), ("d", "ata</w>"), ("a", "l"),
    ("al", "l"), ("all", "</w>"), ("m", "all</w>"), ("s", "mall</w>"),
    ("in", "</w>"), ("j", "o"), ("jo", "in</w>"), ("f", "i"),
    ("fi", "l"), ("fil", "t"), ("filt", "er</w>"), ("b", "i"),
    ("bi", "g</w>"), ("g", "r"), ("gr", "o"), ("gro", "up</w>"),
    ("a", "s"), ("as", "h</w>"), ("h", "ash</w>"), ("c", "u"),
    ("cu", "st"), ("cust", "o"), ("custo", "m"), ("custom", "er</w>"),
    ("or", "t</w>"), ("s", "ort</w>"), ("d", "er</w>"), ("or", "der</w>"),
    ("l", "ow</w>"), ("s", "low</w>"), ("in", "e</w>"), ("l", "ine</w>"),
    ("par", "t</w>"), ("a", "st"), ("ast", "</w>"), ("f", "ast</w>"),
    ("h", "e</w>"), ("r", "ow</w>"), ("t", "he</w>"), ("a", "g"),
    ("ag", "g</w>"), ("e", "y</w>"), ("k", "ey</w>"), ("er", "y</w>")
  ).map { case (l, r) => ((l, r), l + r) }

  /** A merge table as a DuckDB VALUES list `(rank, l, r)` — the
    * oracle-side replay input. Safe to inline: merge symbols are
    * [a-z] and the `</w>` marker only (no quote escaping needed). */
  def mergesSqlValues(merges: Seq[((String, String), String)]): String =
    merges.zipWithIndex
      .map { case (((l, r), _), i) => s"($i, '$l', '$r')" }
      .mkString(", ")

  /** [[FixedMerges]] as a DuckDB VALUES list `(rank, l, r)` — the
    * oracle-side replay of the frozen table. */
  def fixedMergesSqlValues: String = mergesSqlValues(FixedMerges)

  /** Deterministic token-id vocabulary derived ONLY from a merge
    * table — the standard BPE id assignment (base alphabet first, then
    * merge outputs in learned rank order, as GPT-2/sentencepiece do):
    * ids 0–25 the letters, 26 [[EndOfWord]], 27+rank each merge's
    * output symbol. If two merges produce the same string (possible:
    * (a,bc) and (ab,c)), the FIRST rank keeps the id — the symbol in
    * an encoded sequence is just the string, so one id per string is
    * exactly right. A committed table therefore fixes every id
    * forever, and any engine can replay the mapping (see
    * [[vocabSqlValues]]). The base alphabet is a–z only because
    * [[graft.functions.TextFunctions.words]] emits pure [a-z]+ runs. */
  def vocab(merges: Seq[((String, String), String)]): Seq[(String, Int)] = {
    val all = (('a' to 'z').map(_.toString) :+ EndOfWord) ++ merges.map(_._2)
    val seen = collection.mutable.HashSet.empty[String]
    all.zipWithIndex.filter { case (s, _) => seen.add(s) }
  }

  /** [[vocab]] as a DuckDB VALUES list `(sym, id)` — the oracle-side
    * replay of the id assignment. */
  def vocabSqlValues(merges: Seq[((String, String), String)]): String =
    vocab(merges).map { case (s, i) => s"('$s', $i)" }.mkString(", ")

  /** Tokenize the corpus to trainer-consumable token IDS:
    * (doc_id, tokens array<int>, n_tokens), tokens the concatenation
    * of each word's greedy-BPE encoding under [[vocab]]'s ids, in word
    * order; wordless docs keep an empty array. n_tokens = len(tokens)
    * equals [[bpeWordCounts]]-derived counts by construction (same
    * encoder), so H8b packing geometry and these arrays can't drift.
    *
    * Scale shape — the C13/H8b encoder split: the merge automaton runs
    * once per DISTINCT word (vocabulary-sized typed map, rank + vocab
    * tables broadcast); the corpus side is one posexplode + word-key
    * join + per-doc reassembly agg (sort_array on the in-doc word
    * position, then flatten). The reassembly groupBy is the one
    * corpus-sized shuffle — unavoidable: the OUTPUT is a per-doc
    * array, same width as the text itself. */
  def tokenizeDocs(
      docs: DataFrame,
      merges: Seq[((String, String), String)] = FixedMerges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = spark.sparkContext.broadcast(
      merges.map(_._1).zipWithIndex.toMap)
    val ids = spark.sparkContext.broadcast(vocab(merges).toMap)
    val perWord = docs.select(explode(words(col("text"))).as("word"))
      .distinct().as[String]
      .map(w => (w, encodeWord(w, ranks.value).map(ids.value(_)).toArray))
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

  /** Convenience: encode every distinct corpus word, returning
    * (word, tokens) — the inspection/export view of a learned vocab. */
  def bpeEncodeWords(
      docsOrWords: DataFrame,
      merges: Seq[((String, String), String)]): DataFrame = {
    val spark = docsOrWords.sparkSession
    import spark.implicits._
    val ranks = spark.sparkContext.broadcast(
      merges.map(_._1).zipWithIndex.toMap)
    val src: Dataset[String] =
      if (docsOrWords.columns.contains("text"))
        docsOrWords.select(explode(words(col("text"))).as("word"))
          .distinct().as[String]
      else docsOrWords.select(col(docsOrWords.columns.head)).as[String]
    src.map(w => (w, encodeWord(w, ranks.value)))
      .toDF("word", "tokens")
      .orderBy("word")
  }
}
