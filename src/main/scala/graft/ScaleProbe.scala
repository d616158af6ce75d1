package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale probe: runs the flagship scale-path operators on SYNTHETIC
  * frames 100×+ the sf0.1 test corpus, so "would this hold at 1000
  * executors" has measured local evidence behind it, not vibes.
  * (Synthetic input is generated in-plan from spark.range — the parquet
  * test tables stay the correctness surface; this is throughput only.)
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScaleProbe [nDocs]"`.
  */
object ScaleProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Deterministic word-soup corpus: ~60 tokens per doc from a 50-word
    * vocab, plus every 100th doc duplicated with one word changed (a
    * planted near-dup population). */
  def syntheticDocs(spark: SparkSession, n: Long): DataFrame = {
    // letter-only vocab (the tokenizer treats digits as separators, so
    // "w0".."w49" would all collapse to the token "w") as ONE literal
    // array node; the corpus is persisted — generation is setup, not
    // the thing being measured
    val vocab = lit((0 until 50).map(i =>
      s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}x").toArray)
    val base = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), lit(60)),
        i => element_at(vocab, (pmod(xxhash64(col("id") * 1000 + i), lit(50)) + 1).cast("int"))))
        .as("text"))
    val nearDups = base.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + n).as("doc_id"),
        concat(col("text"), lit(" aax")).as("text"))
    base.unionByName(nearDups)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Zipf-ish corpus: token ranks drawn log-uniformly over a 50k-token
    * vocabulary, so a handful of tokens (and the shingles built from
    * them) are corpus-hot while the tail is rare — the regime real text
    * lives in and the one the naive Jaccard self-join dies in. */
  def zipfDocs(spark: SparkSession, n: Long): DataFrame = {
    val V = 50000
    val alpha = lit(('a' to 'z').map(_.toString).toArray)
    // per-row transform like syntheticDocs — deterministic token order
    // and zero shuffles (an explode+collect_list round trip would make
    // each doc's token ORDER, hence its shingle sets and the printed
    // evidence numbers, depend on shuffle arrival order)
    def token(i: Column): Column = {
      // rank = floor(V^(u^2)) for u uniform in [0,1): heavily
      // head-skewed (the top token draws ~25% of all positions) — the
      // Zipf-head regime where the naive posting-list join explodes
      val u = pmod(xxhash64(col("doc_id") * 1000 + i), lit(1000000L))
        .cast("double") / 1e6
      val rank = floor(exp(log(lit(V.toDouble)) * u * u)).cast("long")
      // encode the rank as a 4-letter token (26^4 > 50k)
      concat((0 until 4).map(d =>
        element_at(alpha,
          ((rank.divide(lit(math.pow(26, d)))).cast("long") % 26 + 1).cast("int"))): _*)
    }
    spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(30)), i => token(i))).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = syntheticDocs(spark, nDocs)
    val total = nDocs + nDocs / 100

    val (_, tWc) = time {
      Graft.wordCount(docs).write.format("noop").mode("overwrite").save()
    }
    println(f"wordcount            $total%9d docs  $tWc%7.1f s  ${total / tWc}%9.0f docs/s")

    val (nPairs, tMh) = time { Graft.minhashPairs(docs).count() }
    println(f"minhash+LSH pairs    $total%9d docs  $tMh%7.1f s  ${total / tMh}%9.0f docs/s  ($nPairs pairs)")

    // Incremental near-dup ingest census: the base docs play the lake,
    // the planted twins arrive as the nightly batch. Each twin's only
    // near-dup is its base (the D2 probe above finds EXACTLY the
    // planted pairs), so the flags are an exact census: every twin
    // near-known, none near-in-batch, nothing kept.
    val twinCount = (nDocs + 99) / 100
    val (incAgg, tIm) = time {
      Graft.dedupIncrementalMinhash(
        docs.filter(col("doc_id") >= nDocs),
        docs.filter(col("doc_id") < nDocs))
        .agg(count(lit(1)),
          sum(when(col("is_near_known"), 1L).otherwise(0L)),
          sum(when(col("is_near_in_batch"), 1L).otherwise(0L)),
          sum(col("keep"))).head()
    }
    println(f"incremental minhash  $total%9d docs  $tIm%7.1f s  ${total / tIm}%9.0f docs/s  (${incAgg.getLong(1)} of ${incAgg.getLong(0)} incoming flagged near-known)")
    assert(incAgg.getLong(0) == twinCount && incAgg.getLong(1) == twinCount &&
      incAgg.getLong(2) == 0L && incAgg.getLong(3) == 0L,
      s"incremental near-dup census: (rows, nk, nb, keep) = $incAgg vs $twinCount twins all near-known")
    println(f"incremental census   ${"check"}%9s       every twin near-known to its base, none kept  PASS")

    // Block-level dedup REWRITES the corpus (two wide shuffles — the
    // floor for this op). Every planted twin shares its base doc's
    // first 7 of 8 blocks (~7 excised per twin). The 60-token docs also
    // end in a 4-token TAIL block living in a 50^4 ≈ 6e6 space, so tail
    // blocks birthday-collide legitimately (~n²/2·50⁻⁴ ≈ 20k at 505k
    // docs — cross-doc duplicate text IS what the operator excises);
    // full 8-token blocks (50^8 space) contribute ~0. The bound brackets
    // planted + tail-birthday mass so a pair-manufacturing regression
    // (the failure mode narrow hashes showed elsewhere) still trips it.
    val (bdStats, tBd) = time {
      graft.queries.Blocks.blockDedup(docs)
        .agg(sum(col("n_blocks")), sum(col("n_kept"))).head()
    }
    val excised = bdStats.getLong(0) - bdStats.getLong(1)
    val twinBlocks = 7L * (nDocs / 100)
    val tailBirthday = (total.toDouble * total / 2 / math.pow(50, 4)).toLong
    val (lo, hi) = (twinBlocks + tailBirthday / 2, twinBlocks + 2 * tailBirthday + total / 100)
    println(f"block dedup          $total%9d docs  $tBd%7.1f s  ${total / tBd}%9.0f docs/s  ($excised blocks excised)")
    assert(excised >= lo && excised <= hi,
      s"excised $excised outside [$lo, $hi] (planted $twinBlocks + tail-birthday ~$tailBirthday) — " +
        "rewrite is either missing planted dups or manufacturing phantom ones")
    println(f"block dedup mass     ${"check"}%9s       $excised in [$lo, $hi]  PASS")

    val (nSim, tSh) = time { Graft.simhashPairs(docs).count() }
    println(f"simhash pairs        $total%9d docs  $tSh%7.1f s  ${total / tSh}%9.0f docs/s  ($nSim pairs)")
    // The 28-bit predecessor emitted ~3M borderline pairs at 1e5 docs
    // (birthday-bound saturation). The 64-bit fingerprint must return
    // ~the planted near-dups (one per 100 docs), not a quadratic soup.
    val planted = nDocs / 100
    assert(nSim <= 3 * planted,
      s"simhash saturation: $nSim pairs vs $planted planted — fingerprint too narrow for $total docs")
    println(f"simhash saturation   ${"check"}%9s       $nSim%7d pairs vs $planted planted  PASS")

    // Prefix filtering on a Zipf corpus: the naive posting-list join's
    // row count is Σ C(df, 2) over shingles (the doc_id < doc_id
    // self-join) — computable WITHOUT running it — vs the prefix join's
    // actual candidates. On flat-frequency corpora the two are close;
    // on Zipf (≈ real text) the hot shingles dominate that sum and the
    // prefix filter removes exactly them.
    val zdocs = zipfDocs(spark, nDocs / 5)
    val zTotal = zdocs.count()
    val hs = zdocs.select(col("doc_id"),
      array_distinct(graft.functions.NativeExpressions.shingleHashes(col("text"), 3)).as("hs"))
      .filter(size(col("hs")) > 0)
    val naivePairs = hs.select(explode(col("hs")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * (col("df") - 1) / 2).cast("double")).head.getDouble(0)
    val (nJac, tJp) = time { Graft.jaccardPairsPrefix(zdocs).count() }
    println(f"jaccard prefix       $zTotal%9d docs  $tJp%7.1f s  ${zTotal / tJp}%9.0f docs/s  ($nJac pairs; naive join would materialize ${naivePairs}%.2e rows)")

    // Containment (D12 scale path) on the same Zipf corpus: the
    // asymmetric prefix filter (prefix length keyed to the SMALLER
    // doc's size) must survive the hot-shingle regime too — this row
    // pins the runtime/candidate shape (the Zipf corpus has no >=0.5
    // pairs, like the jaccard row above it).
    val (nCont, tCp) = time { Graft.containmentPairsPrefix(zdocs).count() }
    println(f"containment prefix   $zTotal%9d docs  $tCp%7.1f s  ${zTotal / tCp}%9.0f docs/s  ($nCont pairs)")
    // Non-vacuous invariant on a corpus WITH planted near-dups (a twin
    // per 100 docs sharing all base shingles): containment(A,B) >=
    // jaccard(A,B) always, so at the same 0.5 threshold the
    // jaccard-prefix pairs are a SUBSET of the containment-prefix
    // pairs, and both must recover at least the planted twins. A
    // missing pair means the asymmetric prefix pruned a true candidate.
    val cdocs = syntheticDocs(spark, 20000L)
    // persisted: each pair frame is a full prefix-join + exact-rescore
    // plan, and both feed two actions (count + the left_anti check)
    val jacS = Graft.jaccardPairsPrefix(cdocs).select("id_a", "id_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val contS = Graft.containmentPairsPrefix(cdocs).select("id_a", "id_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (nJacS, nContS) = (jacS.count(), contS.count())
    val jacMissing = jacS.join(contS, Seq("id_a", "id_b"), "left_anti").count()
    assert(nJacS >= 200,
      s"planted twins missing from jaccard-prefix: $nJacS pairs < 200 planted")
    assert(jacMissing == 0,
      s"$jacMissing jaccard>=0.5 pairs absent from containment>=0.5 — asymmetric prefix dropped true candidates")
    assert(nContS >= nJacS, s"containment pairs $nContS < jaccard pairs $nJacS")
    jacS.unpersist(); contS.unpersist(); cdocs.unpersist()
    println(f"containment superset ${"check"}%9s       $nJacS jaccard pairs all within $nContS containment pairs  PASS")

    // As-of join: 10M facts against a 1000-key × 500-epoch state
    // history. The broadcast variant binary-searches per fact; the
    // shuffle variant unions and sorts. The interval theta-join these
    // replace evaluates facts × epochs-per-key residuals (5e9 here —
    // not run); both graft variants must agree row-for-row.
    val nFacts = 10000000L
    val (aKeys, aEpochs) = (1000L, 500L)
    val aFacts = spark.range(nFacts).select(
      pmod(col("id"), lit(aKeys)).as("k"),
      (col("id") * 2654435761L % 1000000007L).as("ft"), col("id"))
    val aStates = spark.range(aKeys * aEpochs).select(
      pmod(col("id"), lit(aKeys)).as("k"),
      (col("id") * 48271L % 1000000007L).as("t"),
      col("id").as("version"), (col("id") % 97).as("value"))
    val (nAsofB, tAsofB) = time {
      Graft.asOfJoin(aFacts, aStates, Seq("k"), "ft", "t", Seq("version", "value"))
        .agg(count(col("version")), xxhash64(sum(col("version")), sum(col("value"))))
        .head
    }
    println(f"asOfJoin broadcast   $nFacts%9d rows  $tAsofB%7.1f s  ${nFacts / tAsofB}%9.0f rows/s  (${nAsofB.getLong(0)} matched)")
    val (nAsofS, tAsofS) = time {
      Graft.asOfJoinBig(aFacts, aStates, Seq("k"), "ft", "t", Seq("version", "value"))
        .agg(count(col("version")), xxhash64(sum(col("version")), sum(col("value"))))
        .head
    }
    println(f"asOfJoin shuffle     $nFacts%9d rows  $tAsofS%7.1f s  ${nFacts / tAsofS}%9.0f rows/s  (${nAsofS.getLong(0)} matched)")
    assert(nAsofB == nAsofS,
      s"as-of variants disagree at scale: $nAsofB vs $nAsofS")
    println(f"asOfJoin agreement   ${"check"}%9s       variants hash-equal  PASS")

    // Connected components on the WORST-CASE shape: one chain of 1M
    // nodes (diameter = n — naive min-label flooding would need 1M
    // rounds) plus 1M random edges over another 2M nodes. The star
    // algorithm must label the whole chain 0 within the O(log n) round
    // budget.
    val nChain = 1000000L
    val chain = spark.range(nChain - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val rand = spark.range(nChain)
      .select((pmod(xxhash64(col("id")), lit(2000000L)) + nChain).as("src"),
        (pmod(xxhash64(col("id") * 31 + 7), lit(2000000L)) + nChain).as("dst"))
    val ((ccLabels, ccRounds), tCc) = time {
      // localFinishEdges = 0: the star ITERATION is what this segment
      // pins — without it a graph under the default threshold would
      // pass the round-budget assertion vacuously via the local path
      val r = graft.ops.ConnectedComponents
        .connectedComponentsInstrumented(chain.unionByName(rand),
          localFinishEdges = 0L)
      (r._1.persist(), r._2)
    }
    val ccN = ccLabels.count()
    val chainBad = ccLabels
      .filter(col("node") < nChain && col("component") =!= 0L).count()
    println(f"connected components ${nChain * 2}%9d edges $tCc%7.1f s  ${nChain * 2 / tCc}%9.0f edges/s  ($ccN nodes, $ccRounds rounds)")
    assert(chainBad == 0, s"$chainBad chain nodes mislabeled")
    val roundBudget = 2 * (64 - java.lang.Long.numberOfLeadingZeros(nChain)) + 6
    assert(ccRounds <= roundBudget,
      s"star algorithm took $ccRounds rounds on a $nChain-node chain (budget $roundBudget) — not the log regime")
    println(f"cc round budget      ${"check"}%9s       $ccRounds rounds <= $roundBudget  PASS")
    ccLabels.unpersist()

    // PageRank over a 4M-edge scale-free-ish graph (every node points
    // at 2 hash-random targets biased toward low ids — a hub-heavy
    // in-degree distribution), ABOVE the edge-broadcast threshold so
    // the shuffle-join iteration path is what's measured. Integer
    // fixed-point: total mass can only shrink (floor divisions), never
    // drift — the conservation bound is asserted, and the biased
    // targets must outrank the median node.
    val nPr = 2000000L
    val prEdges = spark.range(nPr).select(col("id").as("src"),
      pmod(xxhash64(col("id")), expr("id div 2") + 1).as("dst"))
      .unionByName(spark.range(nPr).select(col("id").as("src"),
        pmod(xxhash64(col("id") * 31 + 7), lit(nPr)).as("dst")))
    val (pr, tPr) = time {
      graft.ops.PageRank.pageRank(prEdges, iterations = 3,
        broadcastEdgesBelow = 0L, broadcastRanksBelow = 0L).persist()
    }
    val prStats = pr.agg(count(lit(1)), sum(col("rank")),
      max(col("rank")), min(col("rank"))).head()
    val prMass = prStats.getLong(1)
    val fullMass = prStats.getLong(0) * graft.ops.PageRank.Unit
    println(f"pagerank (3 iters)   ${nPr * 2}%9d edges $tPr%7.1f s  ${nPr * 2 / tPr}%9.0f edges/s  (${prStats.getLong(0)} nodes)")
    assert(prMass <= fullMass && prMass > fullMass * 97 / 100,
      s"rank mass $prMass vs initial $fullMass — rounding may only shave, not drift")
    val hubRank = pr.filter(col("node") === 0L).select("rank").head().getLong(0)
    assert(hubRank > 20L * graft.ops.PageRank.Unit,
      s"node 0 (the in-degree hub) ranks $hubRank — expected a strong hub signal")
    println(f"pagerank sanity      ${"check"}%9s       mass conserved, hub ranks ${hubRank / graft.ops.PageRank.Unit}x uniform  PASS")
    pr.unpersist()

    // Distributed prefix sum at 30M rows — the global-window form would
    // drag all 30M rows through ONE partition; the range+offsets form
    // must stay parallel and agree with itself across partitionings.
    val nPs = 30000000L
    // k = id·odd-constant (no modulus): injective, hash-scattered order
    val psIn = spark.range(nPs)
      .select((col("id") * 2654435761L).as("k"), (col("id") % 1000).as("v"))
    val (psTail, tPs) = time {
      graft.ops.ScaleOps.prefixSum(psIn, "k", "v", "cum")
        .agg(max(col("cum"))).head.getLong(0)
    }
    val psTotal = psIn.agg(sum(col("v"))).head.getLong(0)
    println(f"prefix sum           $nPs%9d rows  $tPs%7.1f s  ${nPs / tPs}%9.0f rows/s  (tail $psTail)")
    assert(psTail == psTotal, s"prefix-sum tail $psTail != total $psTotal")
    println(f"prefix-sum total     ${"check"}%9s       tail == grand total  PASS")

    // One-pass correlation matrix at 5M rows (scale = 1: the ids are
    // already integers; squares stay < 2^63 per row, the decimal sums
    // absorb the 1.2e20 totals). A perfect linear pair must score
    // ~1.0 and a hash-scattered pair ~0 — the two ends any moment
    // bookkeeping error would move.
    val nCo = 5000000L
    val coIn = spark.range(nCo).select(
      col("id").cast("double").as("x"),
      (col("id") * 2).cast("double").as("y"),
      pmod(xxhash64(col("id")), lit(1000003L)).cast("double").as("z"))
    val (coRows, tCoM) = time {
      graft.queries.Profile.correlations(coIn, Seq("x", "y", "z"), scale = 1.0)
        .collect()
    }
    val coMap = coRows.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    println(f"correlations         $nCo%9d rows  $tCoM%7.1f s  ${nCo / tCoM}%9.0f rows/s  (xy ${coMap(("x","y"))}%.6f, xz ${coMap(("x","z"))}%.6f)")
    assert(coMap(("x", "y")) > 0.999999, s"perfect linear pair scored ${coMap(("x", "y"))}")
    assert(math.abs(coMap(("x", "z"))) < 0.01, s"hash-scattered pair scored ${coMap(("x", "z"))}")
    println(f"correlation sanity   ${"check"}%9s       linear ~1, scattered ~0  PASS")

    // Seeded global shuffle on the same machinery: position assignment
    // must stay a permutation at 5M docs (max == count == n, distinct
    // positions == n — any prefix-sum drift or order-key collision
    // breaks one of the three).
    val nSh = 5000000L
    val shIn = spark.range(nSh).select(col("id").as("doc_id"))
    val (shStats, tSh2) = time {
      graft.queries.Shards.shuffleOrder(shIn, seed = 7L)
        .agg(count(lit(1)), max(col("pos")), countDistinct(col("pos"))).head()
    }
    println(f"shuffle order        $nSh%9d docs  $tSh2%7.1f s  ${nSh / tSh2}%9.0f docs/s")
    assert(shStats.getLong(0) == nSh && shStats.getLong(1) == nSh &&
      shStats.getLong(2) == nSh,
      s"shuffle order not a permutation: ${shStats.mkString(", ")} vs $nSh")
    println(f"shuffle permutation  ${"check"}%9s       n distinct positions, max == n  PASS")

    // Decontamination at corpus scale: the whole corpus as train, a
    // ~1-per-499 clone set as the "benchmark". Every eval doc's source
    // shares its entire shingle set and MUST flag; beyond those, only
    // the planted near-dup twins of eval sources overlap (accidental
    // 8-gram collisions across this corpus have expectation « 1). This
    // assertion is what caught the hash-keyed first cut: joining
    // 1e9+7-space poly hashes instead of exact shingles birthday-
    // collided ~1.4k phantom matches at this very size.
    val evalDocs = docs.filter(col("doc_id") % 499 === 0)
      .select((col("doc_id") + 10 * nDocs).as("doc_id"), col("text"))
    val nEval = evalDocs.count()
    val (nFlagged, tDc) = time {
      Graft.decontaminate(docs, evalDocs)
        .filter(col("contaminated") === 1).count()
    }
    println(f"decontaminate        $total%9d docs  $tDc%7.1f s  ${total / tDc}%9.0f docs/s  ($nFlagged flagged vs $nEval eval docs)")
    assert(nFlagged >= nEval && nFlagged <= nEval + 60,
      s"decontamination drift: $nFlagged flagged vs $nEval planted eval sources (+ <=60 near-dup twins)")
    println(f"decontam precision   ${"check"}%9s       flagged == planted + twins, no phantom hits  PASS")

    // The pair-level audit must name exactly one eval doc per flagged
    // train doc here: each eval doc is a clone of ONE source, sources
    // are 499 apart (mutually shingle-disjoint at 8-gram width), so a
    // flagged doc (the source or its near-dup twin) overlaps precisely
    // the clone of itself. More pairs than flags = phantom matches;
    // fewer = the audit lost a flagged doc.
    val (nPairRows, tDp) = time {
      Graft.decontaminatePairs(docs, evalDocs)
        .agg(count(lit(1)), countDistinct(col("train_doc_id"))).head()
    }
    println(f"decontam pairs       $total%9d docs  $tDp%7.1f s  ${total / tDp}%9.0f docs/s  (${nPairRows.getLong(0)} pairs)")
    assert(nPairRows.getLong(0) == nFlagged && nPairRows.getLong(1) == nFlagged,
      s"pair audit: ${nPairRows.getLong(0)} pairs / ${nPairRows.getLong(1)} distinct train docs vs $nFlagged flagged")
    println(f"decontam audit 1:1   ${"check"}%9s       one eval doc per flagged train doc  PASS")

    // Bloom-prefiltered decontamination must reproduce the exact flag
    // bit-for-bit AT SCALE, not just on the sf oracles: compare by a
    // commutative full-row hash digest over the integer columns (the
    // ratio derives from them) — a false positive surviving rescore or
    // a true hit lost to the filter moves it. bit_xor, not sum: a SUM
    // of 1M xxhash64 values overflows BIGINT under ANSI mode.
    def decontamDigest(df: org.apache.spark.sql.DataFrame) =
      df.select(xxhash64(col("doc_id"), col("n_shingles"), col("n_hit"),
          col("contaminated")).as("h"))
        .agg(expr("bit_xor(h)"), count(lit(1))).head()
    val (bloomDigest, tDb) = time {
      decontamDigest(Graft.decontaminateBloom(docs, evalDocs))
    }
    println(f"decontaminate bloom  $total%9d docs  $tDb%7.1f s  ${total / tDb}%9.0f docs/s  (${bloomDigest.getLong(1)} rows digested)")
    val exactDigest = decontamDigest(Graft.decontaminate(docs, evalDocs))
    assert(bloomDigest == exactDigest,
      s"bloom decontamination diverged from exact at scale: $bloomDigest vs $exactDigest")
    println(f"bloom == exact       ${"check"}%9s       row-hash digests equal over ${exactDigest.getLong(1)} docs  PASS")

    // decontaminateBloomBroadcast at its DESIGN POINT: a reference far
    // past the plan-literal sweet spot — ~10^7 distinct shingles (a
    // full eval-suite union / blocklist corpus), 2^27 filter bits
    // (16 MB riding the torrent broadcast; a literal this size would
    // bloat every task binary and make memo plan-compares element-wise
    // over 2M longs). The reference mixes 200k fresh synthetic docs
    // from the SAME vocab (so random cross-set 8-gram collisions
    // exist and the exact rescore has real false positives to kill)
    // with every 997th corpus doc verbatim (planted true hits). The
    // digest equality with the exact flag is the correctness gate; the
    // warm pass measures the repeat-caller path (cached broadcast
    // handle + memoized per-doc frame — no rebuild, no re-broadcast).
    val vocabB = lit((0 until 50).map(i =>
      s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}x").toArray)
    val evalBig = spark.range(200000L).select(
        (col("id") + 20000000L).as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(60)),
          i => element_at(vocabB,
            (pmod(xxhash64(col("id") * 777 + i, lit(99L)), lit(50)) + 1).cast("int"))))
          .as("text"))
      .unionByName(docs.filter(col("doc_id") % 997 === 0)
        .select((col("doc_id") + 30000000L).as("doc_id"), col("text")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEvalBigSh = evalBig
      .select(explode(array_distinct(
        graft.functions.TextFunctions.shingles(
          graft.functions.TextFunctions.words(col("text")),
          graft.queries.Contamination.NgramK))).as("s"))
      .distinct().count()
    val nPlantedBig = docs.filter(col("doc_id") % 997 === 0).count()
    val bigBits = 1 << 27
    val (bbCold, tBbCold) = time {
      decontamDigest(Graft.decontaminateBloomBroadcast(docs, evalBig,
        bits = bigBits, probes = 5))
    }
    val (bbWarm, tBbWarm) = time {
      decontamDigest(Graft.decontaminateBloomBroadcast(docs, evalBig,
        bits = bigBits, probes = 5))
    }
    val (exactBig, tBbExact) = time {
      decontamDigest(Graft.decontaminate(docs, evalBig))
    }
    val nFlaggedBig = Graft.decontaminateBloomBroadcast(docs, evalBig,
        bits = bigBits, probes = 5)
      .filter(col("contaminated") === 1).count()
    println(f"bloom bcast 2^27     $nEvalBigSh%9d ref shingles  cold $tBbCold%6.1f s  warm $tBbWarm%6.1f s  exact $tBbExact%6.1f s  ($nFlaggedBig flagged)")
    assert(bbCold == exactBig && bbWarm == exactBig,
      s"broadcast-Bloom diverged from exact at the 2^27 design point: $bbCold / $bbWarm vs $exactBig")
    assert(nFlaggedBig >= nPlantedBig,
      s"only $nFlaggedBig flagged vs $nPlantedBig planted verbatim copies")
    assert(nEvalBigSh >= 9000000L,
      s"reference built only $nEvalBigSh distinct shingles — not the 10^7 design point")
    println(f"bloom bcast == exact ${"check"}%9s       digests equal, $nPlantedBig planted all flagged, warm reuses handle  PASS")
    evalBig.unpersist(blocking = false)
    graft.queries.Contamination.clearBloomCache()

    // Unigram-LM scoring: vocabulary model (50 terms here; vocab-sized
    // generally) broadcast back over the corpus, per-doc ordered folds.
    val (xStats, tUx) = time {
      Graft.unigramXent(docs).agg(count(lit(1)), min(col("xent")), max(col("xent"))).head
    }
    println(f"unigram xent         $total%9d docs  $tUx%7.1f s  ${total / tUx}%9.0f docs/s  (xent in [${xStats.getDouble(1)}%.2f, ${xStats.getDouble(2)}%.2f])")
    assert(xStats.getLong(0) == total, s"unigramXent dropped docs: ${xStats.getLong(0)} of $total")
    println(f"unigram coverage     ${"check"}%9s       one score per doc  PASS")

    // Collocation mining: two vocabulary-sized count aggs over ~30M
    // unigrams / ~30M bigrams. The synthetic vocab is 50 tokens, so
    // every bigram clears minCount and the candidate set is <= 2500
    // rows — the shape where the counting scans, not the PMI join,
    // are the cost (exactly the 100 TB regime). Lift must be finite
    // and positive (counts can't be zero for a surviving candidate).
    // BPE training: the corpus-sized cost is ONE word-frequency agg;
    // the merge loop is dict-bounded (50-word synthetic vocab here, so
    // merges exhaust when every word is a single symbol). Determinism
    // of the full merge sequence is the assertion that matters — a
    // nondeterministic tie-break would silently fork vocabularies
    // between training runs.
    val (bpe1, tBpe) = time {
      graft.queries.Tokenizer.bpeLearnMerges(docs, merges = 300)
    }
    val bpe2 = graft.queries.Tokenizer.bpeLearnMerges(docs, merges = 300)
    assert(bpe1 == bpe2, "BPE merge sequence not deterministic across runs")
    assert(bpe1.nonEmpty && bpe1.length < 300,
      s"50-word vocab should exhaust below 300 merges, got ${bpe1.length}")
    println(f"bpe train            $total%9d docs  $tBpe%7.1f s  ${total / tBpe}%9.0f docs/s  (${bpe1.length} merges to exhaustion, deterministic)")

    // Incremental merge loop at the production vocab shape: a 50k-word
    // dict x 4000 merges. The naive recount loop is O(merges × dict ×
    // word length) — ~2×10^9 pair-count updates here, minutes of
    // driver time — while the incremental scheme (heap + per-word
    // delta updates, TokenizerSpec-pinned identical selection) touches
    // only the words containing each merged pair. Driver-only cost by
    // design: corpus size never enters this loop.
    val brnd = new scala.util.Random(0xB9E)
    val bigDict = Array.fill(60000)(
        (1 to (3 + brnd.nextInt(10))).map(_ => ('a' + brnd.nextInt(26)).toChar).mkString)
      .distinct.take(50000).map(w => w -> (1L + brnd.nextInt(1000)))
    val (bigMerges, tBpeBig) = time {
      graft.queries.Tokenizer.learnFromDict(bigDict, merges = 4000)
    }
    assert(bigMerges.length == 4000,
      s"50k-word dict exhausted at ${bigMerges.length} of 4000 merges — implausible")
    assert(bigMerges.distinct.length == 4000, "duplicate merge emitted")
    println(f"bpe incremental      ${bigDict.length}%9d words $tBpeBig%7.1f s  ${4000 / tBpeBig}%9.0f merges/s  (4000-merge vocab)")

    // DSIR selection: the corpus-sized cost is one explode + two hash
    // aggs (per-doc bucket counts, global bucket counts); the 4096-row
    // model broadcasts back. Every raw doc must come out scored with a
    // finite weight and the flag must mark exactly k docs — the shape
    // check that matters (on this uniform-vocab corpus the weights
    // themselves cluster near 0; discrimination is SelectionSpec's job).
    val dsirTarget = col("doc_id") % 101 === 0
    val (dsirStats, tDsir) = time {
      Graft.dsirWeights(docs, dsirTarget, keep = 1000)
        .agg(count(lit(1)), sum(col("selected")),
          max(abs(col("weight")))).head()
    }
    val nRaw = docs.filter(!dsirTarget).count()
    println(f"dsir selection       $total%9d docs  $tDsir%7.1f s  ${total / tDsir}%9.0f docs/s  (${dsirStats.getLong(0)} scored, |w|max ${dsirStats.getDouble(2)}%.3f)")
    assert(dsirStats.getLong(0) == nRaw,
      s"scored ${dsirStats.getLong(0)} of $nRaw raw docs — coverage hole")
    assert(dsirStats.getLong(1) == 1000L,
      s"selected ${dsirStats.getLong(1)} != k=1000")
    assert(!dsirStats.getDouble(2).isNaN && !dsirStats.getDouble(2).isInfinite,
      "non-finite DSIR weight at scale")
    println(f"dsir coverage        ${"check"}%9s       all raw docs scored, exactly k selected  PASS")

    // Duplicate-span detection on a planted-span corpus: tokens drawn
    // from a 26^6 space (so RANDOM 5-gram collisions are ~0 at this
    // scale — unlike the 50-word soup, where birthday 5-grams would
    // drown the signal), every 100th doc twinned with tokens 11..20
    // shared. Exactly the starts 11..16 duplicate in each twin-pair
    // member → every span row must be precisely (11, 20, 6) and there
    // must be exactly two rows per planted pair — both a missed-span
    // and a phantom-span regression trip the assert. This assert is
    // what caught the mod-1e9+7 poly-hash first cut: 26M grams
    // birthday-collided into 677,398 span rows (vs 20,000 planted) at
    // 1M docs — the operator now keys grams on md5.
    val spanDocsDf = {
      val alpha = lit(('a' to 'z').map(_.toString).toArray)
      def tok(seed: Column, i: Column): Column = {
        val h = pmod(xxhash64(seed * 64 + i), lit(308915776L)) // 26^6
        concat((0 until 6).map(d =>
          element_at(alpha,
            ((h.divide(lit(math.pow(26, d)))).cast("long") % 26 + 1).cast("int"))): _*)
      }
      val base = spark.range(nDocs).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(30)),
          i => tok(col("id"), i))).as("text"))
      val twins = spark.range(nDocs).filter(col("id") % 100 === 0).select(
        (col("id") + nDocs).as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(30)),
          i => when(i >= 11 && i <= 20, tok(col("id"), i))
            .otherwise(tok(col("id") + nDocs, i)))).as("text"))
      base.unionByName(twins)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val spanTotal = spanDocsDf.count()
    val plantedPairs = (nDocs + 99) / 100
    val (spanAgg, tDs) = time {
      Graft.dupSpans(spanDocsDf, n = 5)
        .agg(count(lit(1)),
          sum(when(col("span_start") === 11L && col("span_end") === 20L &&
            col("n_dup_grams") === 6L, 1L).otherwise(0L))).head()
    }
    println(f"dup spans            $spanTotal%9d docs  $tDs%7.1f s  ${spanTotal / tDs}%9.0f docs/s  (${spanAgg.getLong(0)} spans)")
    assert(spanAgg.getLong(0) == 2 * plantedPairs && spanAgg.getLong(1) == spanAgg.getLong(0),
      s"dup spans: ${spanAgg.getLong(0)} rows (${spanAgg.getLong(1)} exact) vs ${2 * plantedPairs} planted — " +
        "spans missed or phantom spans manufactured")
    println(f"dup span extents     ${"check"}%9s       ${spanAgg.getLong(0)} spans all exactly (11,20,6)  PASS")

    // Span EXCISION census on the same corpus: the keeper of every
    // planted gram is the base twin (smaller doc_id, same positions),
    // so the rewrite must remove EXACTLY tokens 11..20 from each
    // high-id twin and nothing anywhere else — sum(n_excised) is an
    // exact integer, and any phantom dup key or keeper-rule slip
    // changes it. Every doc keeps its output row (n_tokens 30).
    val (excAgg, tEx) = time {
      Graft.exciseSpans(spanDocsDf, n = 5)
        .agg(count(lit(1)), sum(col("n_excised")),
          sum(when(col("n_excised") === 10L, 1L).otherwise(0L)),
          sum(when(col("n_tokens") === 30L, 1L).otherwise(0L))).head()
    }
    println(f"span excision        $spanTotal%9d docs  $tEx%7.1f s  ${spanTotal / tEx}%9.0f docs/s  (${excAgg.getLong(1)} tokens excised)")
    assert(excAgg.getLong(0) == spanTotal && excAgg.getLong(3) == spanTotal,
      s"span excision: ${excAgg.getLong(0)} rows / ${excAgg.getLong(3)} with 30 tokens vs $spanTotal docs — rewrite dropped or malformed docs")
    assert(excAgg.getLong(1) == 10L * plantedPairs && excAgg.getLong(2) == plantedPairs,
      s"span excision: ${excAgg.getLong(1)} tokens excised over ${excAgg.getLong(2)} docs vs ${10L * plantedPairs} over $plantedPairs planted — " +
        "keeper rule or span union drifted")
    println(f"excision census      ${"check"}%9s       ${excAgg.getLong(2)} twins each lost exactly tokens 11..20, keepers intact  PASS")

    // INCREMENTAL span dedup (D27) against the same 505k-doc lake: the
    // lake's state is its gram-key artifact (one-time build, ~24 B/gram,
    // never text); a 1%-sized "nightly" batch — every 10th doc twinned
    // with a LAKE doc on tokens 11..20 — is audited AND rewritten
    // against it. Census: exactly the planted batch twins report the
    // exact (11, 20, 6) span, the rewrite excises exactly their 10
    // planted tokens (lake keepers win — lake ids are smaller), and
    // nothing else anywhere. Cost gate: the batch pass (audit +
    // rewrite, store probe included) must come in well under the FULL
    // D14+D16 re-run over the lake measured above — the "nightly cost
    // scales with the batch, not the lake" claim, asserted.
    val nBatch = math.max(1000L, nDocs / 100)
    val batchDf = {
      val alpha = lit(('a' to 'z').map(_.toString).toArray)
      def tok(seed: Column, i: Column): Column = {
        val h = pmod(xxhash64(seed * 64 + i), lit(308915776L)) // 26^6
        concat((0 until 6).map(d =>
          element_at(alpha,
            ((h.divide(lit(math.pow(26, d)))).cast("long") % 26 + 1).cast("int"))): _*)
      }
      // seeds 2·nDocs.. are disjoint from the lake's (base 0..nDocs,
      // twin filler nDocs..2·nDocs), so only the planted runs collide
      spark.range(nBatch).select((col("id") + 2L * nDocs).as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(30)),
          i => when(col("id") % 10 === 0 && i >= 11 && i <= 20,
              tok(col("id"), i))
            .otherwise(tok(col("id") + 2L * nDocs, i)))).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val nBatchPlanted = (nBatch + 9) / 10
    batchDf.count()
    val (lakeKeyDf, tKeys) = time {
      val kf = Graft.gramKeyFrame(spanDocsDf, n = 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      kf.count()
      kf
    }
    println(f"gram-key artifact    $spanTotal%9d docs  $tKeys%7.1f s  ${spanTotal / tKeys}%9.0f docs/s  (one-time lake state build)")
    val (incSpanAgg, tInc) = time {
      val a = Graft.dupSpansIncremental(batchDf, lakeKeyDf, n = 5)
        .agg(count(lit(1)),
          sum(when(col("span_start") === 11L && col("span_end") === 20L &&
            col("n_dup_grams") === 6L, 1L).otherwise(0L))).head()
      val x = Graft.exciseSpansIncremental(batchDf, lakeKeyDf, n = 5)
        .agg(count(lit(1)), sum(col("n_excised")),
          sum(when(col("n_excised") === 10L, 1L).otherwise(0L))).head()
      (a, x)
    }
    val (incA, incX) = incSpanAgg
    println(f"incremental spans    $nBatch%9d docs  $tInc%7.1f s  ${nBatch / tInc}%9.0f docs/s  (${incA.getLong(0)} spans vs $spanTotal-doc lake)")
    assert(incA.getLong(0) == nBatchPlanted && incA.getLong(1) == nBatchPlanted,
      s"incremental audit: ${incA.getLong(0)} spans (${incA.getLong(1)} exact) vs $nBatchPlanted planted — missed or phantom")
    assert(incX.getLong(0) == nBatch &&
      incX.getLong(1) == 10L * nBatchPlanted && incX.getLong(2) == nBatchPlanted,
      s"incremental rewrite: ${incX.getLong(0)} rows, ${incX.getLong(1)} excised over ${incX.getLong(2)} docs " +
        s"vs ${10L * nBatchPlanted} over $nBatchPlanted planted — keeper or span drift")
    // the cost gate only measures anything once the lake dwarfs the
    // per-query scheduling floor: at 60k docs the full re-run is
    // itself ~6 s of mostly fixed job overhead and the 6-job batch
    // pass cannot undercut it by construction — assert the asymptotic
    // claim at probe scale, report below it
    if (nDocs >= 200000) {
      assert(tInc <= 0.5 * (tDs + tEx),
        f"incremental batch pass ($tInc%.1f s) not clearly under the full lake re-run (${tDs + tEx}%.1f s) — " +
          "cost is not scaling with the batch")
      println(f"incremental census   ${"check"}%9s       $nBatchPlanted twins exact, $tInc%.1f s <= 0.5x full re-run (${tDs + tEx}%.1f s)  PASS")
    } else
      println(f"incremental census   ${"check"}%9s       $nBatchPlanted twins exact (cost gate needs nDocs >= 200k; full re-run ${tDs + tEx}%.1f s, batch $tInc%.1f s)  PASS")
    batchDf.unpersist(blocking = false)
    lakeKeyDf.unpersist(blocking = false)

    // Corpus map through the FULL 100 TB path on the same corpus:
    // fitModel at fitFraction = 0.01 (Lloyd on a ~5k seeded draw + one
    // decile-histogram pass), then assignFrozen places EVERY doc as a
    // pure per-row map (G22 — no join, no agg, no refit), and the
    // census aggregates the frozen frame. Exact-census asserts: every
    // doc placed exactly once, cells/deciles inside their domains, and
    // token mass EXACTLY 30·docs (each synthetic doc is 30 tokens) —
    // a dropped doc, a domain escape, or a token-count drift all trip
    // integers, not tolerances.
    val (cmAgg, tCm) = time {
      val model = Graft.corpusMapModel(spanDocsDf, fitFraction = 0.01)
      Graft.corpusMapAssign(spanDocsDf, model)
        .agg(count(lit(1)), sum(col("n_tokens")),
          min(col("cell")), max(col("cell")),
          min(col("decile")), max(col("decile")),
          countDistinct(col("cell"))).head()
    }
    println(f"corpus map (frozen)  $spanTotal%9d docs  $tCm%7.1f s  ${spanTotal / tCm}%9.0f docs/s  (${cmAgg.getLong(6)} cells live, sample-fit 1%%)")
    assert(cmAgg.getLong(0) == spanTotal && cmAgg.getLong(1) == 30L * spanTotal,
      s"corpus map: placed ${cmAgg.getLong(0)} docs / ${cmAgg.getLong(1)} tokens " +
        s"vs $spanTotal / ${30L * spanTotal} — docs lost or token mass drifted")
    assert(cmAgg.getLong(2) >= 0L &&
      cmAgg.getLong(3) < graft.queries.CorpusMap.MapCells &&
      cmAgg.getLong(4) >= 1L && cmAgg.getLong(5) <= 10L,
      s"corpus map domain escape: cells [${cmAgg.getLong(2)}, ${cmAgg.getLong(3)}], " +
        s"deciles [${cmAgg.getLong(4)}, ${cmAgg.getLong(5)}]")
    println(f"corpus map census    ${"check"}%9s       $spanTotal docs placed once, ${30L * spanTotal} tokens exact, domains held  PASS")

    // Char-granularity span census (D14b) on the SAME corpus: tokens
    // are 6 chars + separator, so the twins' shared tokens 11..20 are
    // one identical char run [70, 140] (the flanking spaces match
    // too). Each twin-pair member must report exactly ONE span
    // covering that run; the flanking tokens differ EXCEPT when their
    // boundary chars collide by chance (1/26 per side), so extents get
    // a ±6-char (one-token) allowance, with n_grams tied to the span
    // length — phantom spans, missed spans, and merge-rule drift all
    // still trip it. Volume note: the per-char positional explode is
    // ~7x the word form's rows (192M grams here) — the declarative
    // analogue of the suffix array's linear index.
    def heldMb(): Double = spark.sparkContext.getRDDStorageInfo
      .map(i => i.memSize + i.diskSize).sum / 1e6
    val heldBefore = heldMb()
    val (charAgg, tCs) = time {
      Graft.dupSpansChar(spanDocsDf, k = 20)
        .agg(count(lit(1)),
          sum(when(col("span_start").between(64L, 70L) &&
            col("span_end").between(140L, 146L) &&
            col("n_dup_grams") === col("span_end") - col("span_start") - 18L,
            1L).otherwise(0L))).head()
    }
    // D14b holds NOTHING in block storage since round 10 (round-9
    // finding: the all-chars memo pinned ~30 B x corpus chars; now one
    // shuffle + a window count paints dup positions in a single pass);
    // report what this run actually pinned so regressions show in
    // probe diffs — expected 0.0 MB
    val charHeld = heldMb() - heldBefore
    println(f"dup spans, char      $spanTotal%9d docs  $tCs%7.1f s  ${spanTotal / tCs}%9.0f docs/s  (${charAgg.getLong(0)} char spans, $charHeld%.1f MB held)")
    assert(charAgg.getLong(0) == 2 * plantedPairs && charAgg.getLong(1) == charAgg.getLong(0),
      s"char spans: ${charAgg.getLong(0)} rows (${charAgg.getLong(1)} in-extent) vs ${2 * plantedPairs} planted — " +
        "phantom char spans, missed spans, or wrong extents")
    println(f"char span extents    ${"check"}%9s       ${charAgg.getLong(0)} spans all cover the planted run  PASS")

    // Suffix-array rank-doubling form (D21) on the SAME corpus: the
    // census must equal the md5 form's exactly — the cross-algorithm
    // differential at probe scale, where a birthday-collision in the
    // hash form or a rank-injectivity slip in the doubling would
    // finally have room to show. Cost shape: the TWO-WORD base pack
    // seeds rank_14 in the map stage, then ONE doubling round
    // (14 -> 20) — a per-doc lead window + a group-partition window
    // over the ~192M per-char rows, two Terasort-shaped integer
    // shuffles vs the md5 form's single hashed pass (was four at the
    // r14 one-word seed); the honest price of hash-free exactness,
    // reported so the trade stays measured.
    val (saAgg, tSa) = time {
      Graft.dupSpansSuffix(spanDocsDf, k = 20)
        .agg(count(lit(1)),
          sum(when(col("span_start").between(64L, 70L) &&
            col("span_end").between(140L, 146L) &&
            col("n_dup_grams") === col("span_end") - col("span_start") - 18L,
            1L).otherwise(0L))).head()
    }
    println(f"dup spans, SA        $spanTotal%9d docs  $tSa%7.1f s  ${spanTotal / tSa}%9.0f docs/s  (${saAgg.getLong(0)} spans, ${tSa / tCs}%.1fx the md5 form)")
    assert(saAgg.getLong(0) == charAgg.getLong(0) && saAgg.getLong(1) == charAgg.getLong(1),
      s"suffix-array spans: ${saAgg.getLong(0)} rows (${saAgg.getLong(1)} in-extent) vs md5 form's " +
        s"${charAgg.getLong(0)} (${charAgg.getLong(1)}) — the two ExactSubstr algorithms disagree at scale")
    println(f"SA == md5 census     ${"check"}%9s       both algorithms report identical span censuses  PASS")
    // Doubling-round count: the cost model quoted above (two-word
    // base-128 seed ⇒ exactly 1 round at k = 20) asserted two ways —
    // the schedule function, and the OPTIMIZED PLAN's lead(r#…) count
    // (one per round; a regression that re-seeds from h = 1 or loses
    // the final-shift cap would add Terasort-shaped shuffles silently).
    val saRounds = graft.queries.SuffixDedup.doublingRounds(20)
    val saLeads = "lead\\(r#".r.findAllIn(
      Graft.dupSpansSuffix(spanDocsDf, k = 20)
        .queryExecution.optimizedPlan.toString).length
    assert(saRounds == 1 && saLeads == 1,
      s"doubling schedule drifted: doublingRounds(20) = $saRounds, " +
        s"plan lead-windows = $saLeads (expected 1 each — 14 -> 20)")
    println(f"SA doubling rounds   ${"check"}%9s       1 round at k=20 (schedule AND plan)  PASS")
    spanDocsDf.unpersist(blocking = false)
    graft.ops.Release.sweep(spark)

    // Hot-gram skew regime: ONE boilerplate 5-gram (a licence-header /
    // template stanza) planted at positions 1..5 of 30% of the corpus,
    // so a single gram key carries 0.3n of the paint join's matched
    // rows — the skew the uniform census above never exercises. All
    // OTHER tokens are INJECTIVE in (doc, pos) (base-26 digits of
    // doc·64+pos, no hashing), so the expected census is exact:
    // precisely 0.3n span rows, every one (1, 5, 1) — gram p=1 is the
    // only duplicated gram (p=2 already covers an injective token).
    // The wall-time gate is RELATIVE to the uniform probe above (same
    // operator, same corpus size, same machine minutes apart): an
    // absolute budget would re-create the round-7 ambient-noise trap.
    // Under AQE the 1-row duplicated-hash side broadcasts and the
    // per-doc window sees ≤ 1 row per hot doc, so the hot run should
    // land near the uniform run, not at a skew cliff.
    val hotDocsDf = {
      val alpha = lit(('a' to 'z').map(_.toString).toArray)
      // injective letter token: 7 base-26 digits of doc*64+pos
      // (injective for doc*64+pos < 26^7 ≈ 8e9, i.e. any probe size)
      def utok(i: Column): Column = {
        val v = col("id") * 64 + i
        concat((0 until 7).map(d =>
          element_at(alpha,
            ((v.divide(lit(math.pow(26, d)))).cast("long") % 26 + 1).cast("int"))): _*)
      }
      val boiler = Seq("licenseq", "headerzz", "allq", "rightsq", "reservedq")
      spark.range(nDocs).select(col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(1), lit(30)),
            i => when(col("id") % 10 < 3 && i <= 5,
                element_at(lit(boiler.toArray), i.cast("int")))
              .otherwise(utok(i)))).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val nHot = hotDocsDf.filter(col("doc_id") % 10 < 3).count()
    val (hotAgg, tHot) = time {
      Graft.dupSpans(hotDocsDf, n = 5)
        .agg(count(lit(1)),
          sum(when(col("span_start") === 1L && col("span_end") === 5L &&
            col("n_dup_grams") === 1L, 1L).otherwise(0L))).head()
    }
    println(f"dup spans, hot gram  $nDocs%9d docs  $tHot%7.1f s  ${nDocs / tHot}%9.0f docs/s  (${hotAgg.getLong(0)} spans on 1 corpus-hot gram)")
    assert(hotAgg.getLong(0) == nHot && hotAgg.getLong(1) == nHot,
      s"hot-gram spans: ${hotAgg.getLong(0)} rows (${hotAgg.getLong(1)} exact) vs $nHot planted — " +
        "phantom spans, missed spans, or wrong extents under a corpus-hot gram")
    val hotBudget = 3.0 * math.max(tDs, 1.0)
    assert(tHot <= hotBudget,
      f"hot-gram span run $tHot%.1f s blew the ${hotBudget}%.1f s budget " +
        f"(3x the uniform census's $tDs%.1f s) — gram-key skew is biting the paint join")
    println(f"hot-gram skew gate   ${"check"}%9s       $nHot spans exact, $tHot%.1f s <= 3x uniform ($tDs%.1f s)  PASS")
    hotDocsDf.unpersist(blocking = false)
    graft.ops.Release.sweep(spark)

    // Weighted sampling: a pure map + TakeOrdered — the floor for any
    // top-k draw. k rows out, every weight positive, heaviest-decile
    // docs should dominate a uniform draw (A-ES bias sanity).
    val (wsRows, tWs) = time {
      Graft.weightedSample(docs, k = 1000, seed = 7L).collect()
    }
    println(f"weighted sample      $total%9d docs  $tWs%7.1f s  ${total / tWs}%9.0f docs/s  (k=${wsRows.length})")
    assert(wsRows.length == 1000 && wsRows.forall(_.getLong(1) > 0L),
      "weighted sample: wrong k or non-positive weight drawn")
    println(f"weighted sample k    ${"check"}%9s       1000 rows, weights positive  PASS")

    val (collocs, tCo) = time {
      Graft.collocations(docs, minCount = 5L, topN = 25).collect()
    }
    assert(collocs.length == 25, s"expected 25 collocations, got ${collocs.length}")
    val lifts = collocs.map(_.getAs[Double]("lift"))
    assert(lifts.forall(l => l > 0 && !l.isInfinite && !l.isNaN),
      s"non-finite or non-positive lift in ${lifts.mkString(",")}")
    assert(lifts.sameElements(lifts.sortBy(-_)),
      "collocations not ordered by lift desc")
    println(f"collocations         $total%9d docs  $tCo%7.1f s  ${total / tCo}%9.0f docs/s  (top lift ${lifts.head}%.3f)")

    val nRows = 30000000L
    val big = spark.range(nRows).select(
      pmod(col("id"), lit(1000)).as("k"),
      (col("id") * 2654435761L % 1000003).as("score"), col("id"))
    val (nTop, tTk) = time {
      Graft.topKPerKey(big, Seq(col("k")), Seq(col("score").desc, col("id")), 5).count()
    }
    println(f"topKPerKey           $nRows%9d rows  $tTk%7.1f s  ${nRows / tTk}%9.0f rows/s  ($nTop out)")
    val w = Window.partitionBy(col("k")).orderBy(col("score").desc, col("id"))
    val (_, tWin) = time {
      big.withColumn("rn", rank().over(w)).filter(col("rn") <= 5).count()
    }
    println(f"  (window rank form) $nRows%9d rows  $tWin%7.1f s  ${nRows / tWin}%9.0f rows/s")

    // Trained-centroid IVF at ANN scale: 1M 16-d vectors in 32 planted
    // clusters (hash-random centers ±1, per-vector noise ±0.1). The
    // timed run is the full library path — KMeans fit (k=100 sub-cells)
    // + probed search for all 10k %100 queries. Recall@5 is then
    // measured on a 100-query subsample against its exact brute-force
    // ground truth (the full 10k x 1M GT would be 1e10 dots — the very
    // thing IVF exists to avoid).
    import graft.functions.VectorFunctions.{cosineFrom, dot, norm2}
    val nVec = 1000000L
    val vDims = 16
    val emb = spark.range(nVec).select(col("id").as("vec_id"),
        array((0 until vDims).map { d =>
          ((pmod(xxhash64(col("id") % 32 * 31 + d), lit(2000L)).cast("double") / 1000.0 - 1.0) +
            (pmod(xxhash64(col("id") * 17 + d), lit(2000L)).cast("double") / 10000.0 - 0.1))
            .cast("float")
        }: _*).as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count() // generation is setup, not the measured path
    val (nIvfRows, tIvf) = time {
      graft.queries.Similarity.annIvfTrained(emb, cells = 100, probes = 3).count()
    }
    println(f"IVF trained (k=100)  $nVec%9d vecs  $tIvf%7.1f s  ${nVec / tIvf}%9.0f vecs/s  ($nIvfRows result rows)")
    val vv = emb.select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("n2"))
    val sub = vv.filter(col("vec_id") % 10000 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("n2").as("q_n2"))
    val gtW = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    val gt = sub.join(vv, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        cosineFrom(dot(col("q_emb"), col("embedding")), col("q_n2"), col("n2")).as("cos"))
      .withColumn("rn", row_number().over(gtW)).filter(col("rn") <= 5)
      .select(col("q_id"), col("vec_id"), col("cos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ivfSub = graft.queries.Similarity.annIvfTrained(emb, cells = 100, probes = 3)
      .filter(col("q_id") % 10000 === 0)
      .select(col("q_id"), col("neighbor_id").as("vec_id"))
    val nGt = gt.count()
    val hit = gt.join(ivfSub, Seq("q_id", "vec_id"), "left_semi").count()
    val recall = hit.toDouble / nGt
    println(f"IVF trained recall@5 ${"check"}%9s       $recall%.3f over ${nGt / 5} queries")
    assert(recall >= 0.7,
      f"trained-IVF recall $recall%.3f below 0.7 — probed cells are missing true neighbors")
    println(f"IVF recall floor     ${"check"}%9s       $recall%.3f >= 0.7  PASS")

    // IVF-PQ at the same 1M vectors: build ONCE (1 + m KMeans fits +
    // the full-corpus encode — the expensive half), then search-only
    // against the fitted index. Search ships only (vec_id, cell,
    // code[4]) rows + ADC table lookups and must come in well under
    // the build. Quality gate: EPSILON-recall (the ann-benchmarks
    // metric) — a returned neighbor counts if its exact cosine is
    // within eps of the query's true 5th-best. Exact-ID recall is the
    // WRONG gate on this corpus by construction: each planted cluster
    // holds ~31k near-identical vectors (cos ~0.9999 apart, inside PQ
    // quantization error), so identifying the literal top-5 among them
    // exceeds any bounded-rescore budget, while a plumbing bug (wrong
    // cells, broken codes, empty slices) drops returned cosines to
    // cross-cluster levels and still trips the eps gate.
    val (pqIdx, tPqB) = time {
      val i = graft.queries.Similarity.buildPqIndex(
        emb, cells = 100, m = 4, ksub = 16, dims = vDims)
      i.index.count() // materialize the persisted encode: that IS the build
      i
    }
    val pqQueries = emb.filter(col("vec_id") % 10000 === 0)
    val (pqRes, tPqS) = time {
      val r = graft.queries.Similarity.searchPqIndex(pqIdx, emb, pqQueries,
          probes = 3, rescore = 50)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count()
      r
    }
    val nPqRows = pqRes.count()
    println(f"IVF-PQ build (1M)    $nVec%9d vecs  $tPqB%7.1f s  ${nVec / tPqB}%9.0f vecs/s  (m=4 ksub=16 cells=100)")
    println(f"IVF-PQ search-only   ${nVec / 10000}%9d qrys  $tPqS%7.1f s  ($nPqRows result rows)")
    assert(nPqRows == (nVec / 10000) * 5, s"expected top-5 per query, got $nPqRows rows")
    val gt5 = gt.groupBy("q_id").agg(min(col("cos")).as("cos5"))
    val eps = 0.01
    val nEpsOk = pqRes.join(gt5, "q_id")
      .filter(col("cos") >= col("cos5") - eps).count()
    val epsRecall = nEpsOk.toDouble / nPqRows
    val idHit = gt.select("q_id", "vec_id").join(
      pqRes.select(col("q_id"), col("neighbor_id").as("vec_id")),
      Seq("q_id", "vec_id"), "left_semi").count()
    println(f"IVF-PQ eps-recall@5  ${"check"}%9s       $epsRecall%.3f (eps=$eps; exact-id ${idHit.toDouble / nGt}%.3f over ${nGt / 5} queries)")
    assert(epsRecall >= 0.95,
      f"IVF-PQ eps-recall $epsRecall%.3f below 0.95 — returned neighbors are not near-equivalent to the true top-5")
    println(f"PQ eps-recall floor  ${"check"}%9s       $epsRecall%.3f >= 0.95  PASS")
    assert(tPqS < tPqB,
      f"search-only ($tPqS%.1f s) not cheaper than the one-time build ($tPqB%.1f s) — the index isn't paying for itself")
    println(f"PQ amortization      ${"check"}%9s       search $tPqS%.1f s < build $tPqB%.1f s  PASS")
    pqRes.unpersist()

    // Sample-fit census — the 100 TB FIT path: the same IVF-PQ build at
    // fitFraction = 0.01, so the 1 + m KMeans fits train on a ~10k
    // seeded deterministic draw while the encode pass still codes all
    // 1M vectors. Pins the two numbers the API exists for: the build-
    // time ratio (the fits collapse toward the encode floor; the full
    // build above also paid the one-time normalize+persist both builds
    // share, so the printed ratio UNDERstates the fit-side saving) and
    // the eps-recall delta (codebooks from 1% of the corpus must still
    // clear the same 0.95 floor the full fit does).
    val (sIdx, tPqBs) = time {
      val i = graft.queries.Similarity.buildPqIndex(
        emb, cells = 100, m = 4, ksub = 16, dims = vDims, fitFraction = 0.01)
      i.index.count() // materialize the full-corpus encode
      i
    }
    val (sRes, tPqSs) = time {
      val r = graft.queries.Similarity.searchPqIndex(sIdx, emb, pqQueries,
          probes = 3, rescore = 50)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count()
      r
    }
    val nSRows = sRes.count()
    assert(nSRows == (nVec / 10000) * 5,
      s"sample-fit index: expected top-5 per query, got $nSRows rows")
    val nEpsOkS = sRes.join(gt5, "q_id")
      .filter(col("cos") >= col("cos5") - eps).count()
    val epsRecallS = nEpsOkS.toDouble / nSRows
    println(f"PQ sample-fit (1%%)   $nVec%9d vecs  $tPqBs%7.1f s  build ${tPqB / tPqBs}%.1f x faster than full fit  (search $tPqSs%.1f s)")
    println(f"PQ sample-fit recall ${"check"}%9s       eps-recall@5 $epsRecallS%.3f vs full-fit $epsRecall%.3f (delta ${epsRecall - epsRecallS}%+.3f)")
    assert(epsRecallS >= 0.95,
      f"sample-fit eps-recall $epsRecallS%.3f below the 0.95 floor — 1%% codebooks degraded the index")
    // 1.5x margin, not raw <=: the measured saving is ~1.3x (the encode
    // floor dominates both builds), so a GC pause or co-tenant spike
    // could flip a raw comparison and abort the whole probe on a run
    // where the fit-scan saving is real — the same reason every other
    // timing gate in this file keeps a several-x margin. And ONE
    // isolated re-time before failing (the Bench suspect-row policy,
    // advisor r13): with only ~1.3x measured headroom, a single
    // co-tenant spike on the sampled build could still breach 1.5x —
    // take the min of two timings so a one-off spike can't abort the
    // whole 1M-vector probe.
    val tPqBsBest =
      if (tPqBs <= 1.5 * tPqB) tPqBs
      else {
        val (idx2, t2) = time {
          val i = graft.queries.Similarity.buildPqIndex(
            emb, cells = 100, m = 4, ksub = 16, dims = vDims, fitFraction = 0.01)
          i.index.count()
          i
        }
        idx2.release()
        println(f"PQ sample-fit retime $nVec%9d vecs  $t2%7.1f s  (first timing $tPqBs%.1f s breached the 1.5x gate)")
        math.min(tPqBs, t2)
      }
    assert(tPqBsBest <= 1.5 * tPqB,
      f"sample-fit build ($tPqBsBest%.1f s best-of-2) > 1.5x the full fit ($tPqB%.1f s) — the draw isn't cutting the fit scans")
    println(f"sample-fit census    ${"check"}%9s       0.95 floor held at fitFraction=0.01  PASS")
    sRes.unpersist()
    sIdx.release()

    // OPQ at 1M vectors — feasible ONLY through the sample-fit path:
    // the full-fraction fit re-persists and re-scans a corpus-sized
    // rotated frame opqRounds times (the round-12 verdict's one real
    // scale-killer), while at fitFraction = 0.01 each round rotates and
    // fits the ~10k-vector draw and only the final rotate + encode see
    // the corpus. No full-fit comparison here — that is the very run
    // this path exists to avoid; quality holds to the same eps gate.
    val (oIdx, tOpqB) = time {
      val i = graft.queries.Similarity.buildOpqIndex(
        emb, cells = 100, m = 4, ksub = 16, dims = vDims,
        opqRounds = 4, fitFraction = 0.01)
      i.pq.index.count()
      i
    }
    val (oRes, tOpqS) = time {
      val r = graft.queries.Similarity.searchOpqIndex(oIdx, emb, pqQueries,
          probes = 3, rescore = 50)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count()
      r
    }
    val nORows = oRes.count()
    assert(nORows == (nVec / 10000) * 5,
      s"sample-fit OPQ: expected top-5 per query, got $nORows rows")
    val nEpsOkO = oRes.join(gt5, "q_id")
      .filter(col("cos") >= col("cos5") - eps).count()
    val epsRecallO = nEpsOkO.toDouble / nORows
    println(f"OPQ sample-fit (1M)  $nVec%9d vecs  $tOpqB%7.1f s  ${nVec / tOpqB}%9.0f vecs/s  (4 rounds, fitFraction=0.01; search $tOpqS%.1f s)")
    assert(epsRecallO >= 0.95,
      f"sample-fit OPQ eps-recall $epsRecallO%.3f below the 0.95 floor")
    println(f"OPQ sample-fit gate  ${"check"}%9s       eps-recall@5 $epsRecallO%.3f >= 0.95  PASS")
    oRes.unpersist()
    oIdx.pq.release()

    pqIdx.release()
    gt.unpersist()
    emb.unpersist()

    // SemDeDup at 1M vectors — the one operator whose quadratic term
    // lives INSIDE cells, so what this probe pins is the sizing: auto
    // cells = ceil(sqrt(N)) (~1005 here) bounds assignment (N·k) and
    // within-cell exact pairing (Σ occ²) at ~N^1.5 total work. The
    // corpus is hash-random 16-d directions (so first-k deterministic
    // centroids see a BALANCED direction distribution — the regime the
    // operator contracts for; direction-skewed corpora need trained
    // centroids, per the scaladoc), with every 100th vector twinned at
    // cos ~0.9999. At minCosine = 0.99 random 16-d pairs clear the
    // threshold with probability ~1e-12 (5e8 candidate pairs -> ~0
    // phantoms), so dropped == co-located planted twins, an exact-ish
    // census: >= 90% of twins (a pair legitimately splits when its
    // best-vs-second centroid gap is under the twin noise), <= planted
    // (any excess = phantom drops).
    def semVec(seed: Column, noise: Boolean): Column =
      array((0 until vDims).map { d =>
        val base = pmod(xxhash64(seed * 31 + d), lit(2000L))
          .cast("double") / 1000.0 - 1.0
        (if (noise)
          base + (pmod(xxhash64(seed * 17 + d + 3), lit(200L))
            .cast("double") / 10000.0 - 0.01)
        else base).cast("float")
      }: _*)
    val nSem = 1000000L
    val semPlanted = (nSem + 99) / 100
    val semBase = spark.range(nSem)
      .select(col("id").as("vec_id"), semVec(col("id"), noise = false).as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val semAll = semBase.unionByName(
        spark.range(nSem).filter(col("id") % 100 === 0)
          .select((col("id") + nSem).as("vec_id"),
            semVec(col("id"), noise = true).as("embedding")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val semTotal = semAll.count()
    semBase.count()
    // JIT/codegen warmup at 1/50 scale: the twinned run is timed first
    // and would otherwise carry the whole plan shape's compilation cost
    // that the uniform run then gets for free — skewing the relative
    // gate below in one direction only
    Graft.semanticDedup(semAll.filter(col("vec_id") % 50 === 0),
      minCosine = 0.99).write.format("noop").mode("overwrite").save()
    val semOut = Graft.semanticDedup(semAll, minCosine = 0.99)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (semAgg, tSem) = time {
      semOut.agg(count(lit(1)), sum(lit(1L) - col("kept"))).head()
    }
    println(f"semdedup (auto k)    $semTotal%9d vecs  $tSem%7.1f s  ${semTotal / tSem}%9.0f vecs/s  (${semAgg.getLong(1)} dropped of $semPlanted planted twins)")
    assert(semAgg.getLong(0) == semTotal,
      s"semanticDedup emitted ${semAgg.getLong(0)} rows for $semTotal vectors")
    assert(semAgg.getLong(1) >= semPlanted * 9 / 10 && semAgg.getLong(1) <= semPlanted,
      s"semdedup census: ${semAgg.getLong(1)} dropped vs $semPlanted planted twins — " +
        "phantom drops or cell-split losses beyond the boundary allowance")
    println(f"semdedup census      ${"check"}%9s       dropped in [${semPlanted * 9 / 10}, $semPlanted]  PASS")
    // Occupancy census — the auto-sizing invariant itself: Σ occ² is
    // the exact within-cell candidate-pair mass (×2); it must stay
    // within a small factor of the balanced N^1.5, and no single cell
    // may hoard the corpus. This is the bound whose absence was the
    // round-8 watch item ("cells = 10 makes pairing O((N/10)²)").
    val kAuto = math.ceil(math.sqrt(semTotal.toDouble)).toLong
    val occ = semOut.groupBy("cell")
      .agg(count(lit(1)).as("occ"))
      .agg(sum(col("occ") * col("occ")), max(col("occ")), count(lit(1))).head()
    val pairMass = occ.getLong(0)
    val massBudget = 10L * semTotal * kAuto // 10 x the balanced Σocc² = N²/k
    println(f"semdedup occupancy   ${occ.getLong(2)}%9d cells       max ${occ.getLong(1)}, Σocc² ${pairMass}%.2e")
    assert(pairMass <= massBudget,
      f"semdedup cell mass $pairMass%.2e exceeds ${massBudget}%.2e (10x balanced) — occupancy skew is making cells quadratic")
    assert(occ.getLong(1) <= 50L * kAuto,
      s"hottest cell holds ${occ.getLong(1)} vectors (~${occ.getLong(1) / kAuto}x sqrt(N)) — a direction cluster is hoarding")
    println(f"semdedup cell bound  ${"check"}%9s       Σocc² <= 10x balanced, max cell <= 50x sqrt(N)  PASS")
    semOut.unpersist()
    // Wall-time gate, the D14 hot-vs-uniform pattern: the same operator
    // on the twin-less base corpus minutes apart — a relative gate (an
    // absolute budget would re-create the round-7 ambient-noise trap).
    // The twinned run adds only the planted pairs' loser plumbing, so
    // 3x headroom flags any structural blowup in the pair/loser path.
    val (semUniAgg, tSemUni) = time {
      Graft.semanticDedup(semBase, minCosine = 0.99)
        .agg(count(lit(1)), sum(lit(1L) - col("kept"))).head()
    }
    println(f"semdedup uniform     $nSem%9d vecs  $tSemUni%7.1f s  ${nSem / tSemUni}%9.0f vecs/s  (${semUniAgg.getLong(1)} dropped)")
    assert(semUniAgg.getLong(1) <= 2L,
      s"${semUniAgg.getLong(1)} drops on the twin-less corpus — phantom near-dups at minCosine 0.99")
    val (tSlow, tFast) = (math.max(tSem, tSemUni), math.min(tSem, tSemUni))
    assert(tSlow <= 3.0 * math.max(tFast, 1.0),
      f"semdedup runs diverge: twinned $tSem%.1f s vs uniform $tSemUni%.1f s — structural cost, not noise")
    println(f"semdedup time gate   ${"check"}%9s       twinned $tSem%.1f s within 3x of uniform $tSemUni%.1f s  PASS")
    // Feature-hashed corpus embedding (E9): ONE scan, one (doc, dim)
    // agg — the text→vector bridge must stay a pure pipeline at scale.
    // Census: every ±1 contribution is conserved, so Σ|q| ≤ total word
    // occurrences with equality exactly when no (doc, dim) cell mixes
    // signs — both computable without re-running the operator.
    val (deAgg, tDe) = time {
      Graft.docEmbed(docs)
        .agg(sum(abs(col("q"))), count(lit(1))).head()
    }
    val occTotal = docs.select(explode(
      graft.functions.TextFunctions.words(col("text")))).count()
    println(f"doc embed (hashing)  $total%9d docs  $tDe%7.1f s  ${total / tDe}%9.0f docs/s  (${deAgg.getLong(1)} sparse cells, |q| mass ${deAgg.getLong(0)})")
    assert(deAgg.getLong(0) <= occTotal && deAgg.getLong(0) > occTotal / 2,
      s"signed mass ${deAgg.getLong(0)} vs $occTotal occurrences — " +
        "contributions lost or manufactured")
    println(f"doc embed census     ${"check"}%9s       |q| mass within (${occTotal / 2}, $occTotal]  PASS")
    // sweep BEFORE the heaviest composed segment: the doc-embed memo
    // frames otherwise stay pinned into the capstone, and the probe
    // OOMed once (8g driver) in exactly the CacheManager rebuild
    // cascade that cache-eviction pressure triggers (the round-10
    // clearCache lesson's memory-pressure sibling)
    graft.ops.Release.sweep(spark)

    // The D18 CAPSTONE as one composed plan at 505k docs — the stages
    // are individually probed above; what composition can still break
    // is the plan itself (a missed memo re-running the 4-stage cleaning
    // chain per consumer — exactly the class the D15 probe caught).
    // Structure: train = the synthetic corpus (planted near-dup twins
    // every 100 docs survive EXACT dedup, then ExactSubstr excision
    // strips their duplicated runs); eval = verbatim copies of every
    // 1000th base doc (decontamination must drop the base AND its twin
    // — the twin shares every base 8-gram).
    val capStops = Seq("aax", "abx", "acx", "adx", "aex", "afx") // corpus-bearing
    // C16 stop set, wide enough that P(doc carries < 2 of them) ~ 1%
    val capEval = docs.filter(col("doc_id") % 1000 === 0 && col("doc_id") < nDocs)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val (capOut, tCap) = time {
      Graft.pipelineProduce(docs, capEval, minWords = 50L, stops = capStops)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val capAgg = capOut.agg(count(lit(1)).as("n"),
      countDistinct(col("pos")).as("npos"), max(col("pos")).as("maxpos"),
      sum(col("n_tokens")).as("toks"),
      max(expr(s"seq_first * ${graft.queries.Shards.DefaultContextLen} + seq_offset + n_tokens")).as("endtok")).head()
    println(f"capstone produce     $total%9d docs  $tCap%7.1f s  ${total / tCap}%9.0f docs/s  (${capAgg.getLong(0)} produced, ${capAgg.getLong(3)} BPE tokens)")
    // epoch order is a permutation of the produced docs
    assert(capAgg.getLong(1) == capAgg.getLong(0) &&
      capAgg.getLong(2) == capAgg.getLong(0),
      s"epoch positions are not a permutation: $capAgg")
    // packing geometry is globally consistent: the furthest token edge
    // equals the total token count (at the default contextLen)
    assert(capAgg.getLong(4) == capAgg.getLong(3),
      s"packing end ${capAgg.getLong(4)} != total tokens ${capAgg.getLong(3)}")
    // decontamination: every eval-copied base doc AND its planted twin
    // is gone (the twin shares all base 8-grams); spot the census on
    // the id structure — base b (b %% 1000 == 0) and twin b + nDocs
    val contamIds = capOut.filter(
      (col("doc_id") % 1000 === 0 && col("doc_id") < nDocs) ||
        (col("doc_id") >= nDocs && (col("doc_id") - nDocs) % 1000 === 0))
      .count()
    assert(contamIds == 0L,
      s"$contamIds eval-leaked docs survived the capstone's decontamination stage")
    // excision: surviving twins (near-dups, NOT exact dups) must have
    // lost the bulk of their tokens to ExactSubstr — their text is the
    // base doc's text plus one word, so nearly every gram is a
    // duplicate occurrence losing to the base's keeper
    val twinTok = capOut.filter(col("doc_id") >= nDocs)
      .agg(count(lit(1)), avg(col("n_tokens"))).head()
    val baseAvg = capOut.filter(col("doc_id") < nDocs)
      .agg(avg(col("n_tokens"))).head().getDouble(0)
    // every 10th twin's base is eval-copied, so that twin MUST fall to
    // decontamination (shares all base grams): the twin census is
    // bracketed — at most planted minus those, at least that minus the
    // ~1% stop-gate tail
    val twinHi = nDocs / 100 - nDocs / 1000
    assert(twinTok.getLong(0) <= twinHi &&
      twinTok.getLong(0) >= twinHi * 95 / 100,
      s"${twinTok.getLong(0)} twins in output vs expected ~$twinHi — " +
        "near-dups mishandled by gates/dedup/decontamination")
    assert(twinTok.getDouble(1) < baseAvg / 2,
      f"twin avg ${twinTok.getDouble(1)}%.1f tokens vs base avg $baseAvg%.1f — " +
        "ExactSubstr excision did not strip the duplicated runs")
    println(f"capstone census      ${"check"}%9s       permutation + packing exact, eval leaks 0, twins excised (${twinTok.getDouble(1)}%.1f vs $baseAvg%.1f tok avg)  PASS")
    capOut.unpersist()
    graft.ops.Release.sweep(spark)

    // STREAM → ARTIFACT at 505k: the staging lake written batch-wise
    // (5 appends, one replayed — the failure-retry shape), then ONE
    // scheduled compaction to epoch-shard files. Equality-by-census vs
    // the capstone above: compactShards re-runs the same screens over
    // the same logical corpus with the same seed, so produced doc and
    // token totals must MATCH the pipelineProduce numbers exactly, the
    // replayed batch must change nothing (dropDuplicates repair), and
    // verifyShards must come back clean on the written artifact.
    val compactRoot = java.nio.file.Files.createTempDirectory("graft-probe-compact")
    val stagingDir = compactRoot.resolve("staging").toString
    val shardsDir = compactRoot.resolve("shards").toString
    val (_, tStage) = time {
      (0 until 5).foreach { b =>
        docs.filter(col("doc_id") % 5 === b)
          .select(col("doc_id"), col("text"))
          .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(stagingDir)
      }
      // replay batch 2 verbatim: identical rows double-appended
      docs.filter(col("doc_id") % 5 === 2)
        .select(col("doc_id"), col("text"))
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(stagingDir)
    }
    val (compactManifest, tCompact) = time {
      Graft.compactShards(spark, stagingDir, capEval, shardsDir,
        minWords = 50L, stops = capStops, budget = 1L << 20)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val cm = compactManifest.agg(count(lit(1)), sum(col("n_docs")),
      sum(col("n_tokens"))).head()
    println(f"compact shards       $total%9d docs  $tCompact%7.1f s  ${total / tCompact}%9.0f docs/s  (${cm.getLong(0)} shards, ${cm.getLong(1)} docs, ${cm.getLong(2)} tokens; staged in $tStage%.1f s)")
    assert(cm.getLong(1) == capAgg.getLong(0) && cm.getLong(2) == capAgg.getLong(3),
      s"compacted artifact (${cm.getLong(1)} docs, ${cm.getLong(2)} tokens) != " +
        s"capstone census (${capAgg.getLong(0)}, ${capAgg.getLong(3)}) — " +
        "staging/dedup/compaction drifted from the batch pipeline")
    val shardDiff = graft.sources.Sinks.verifyShards(spark, shardsDir).count()
    assert(shardDiff == 0L, s"$shardDiff shards failed the loader integrity diff")
    // budget geometry: every shard but the last stays within one doc of
    // the token budget (a doc may straddle the boundary)
    // tolerance = the largest single doc in the artifact: a shard
    // closes when cumulative tokens REACH the budget, so the overshoot
    // is bounded by the straddling doc, not a fixed constant (a fixed
    // +200 margin tripped at the 100k probe size, where one ~203-token
    // doc straddled the boundary — the geometry was correct)
    val shardRows = graft.sources.Sinks.readShards(spark, shardsDir)
    val maxDocTok = shardRows.agg(max(col("n_tokens"))).head().getLong(0)
    val geo = shardRows
      .groupBy("shard_id").agg(sum(col("n_tokens")).as("t")).agg(
        max(when(col("shard_id") < cm.getLong(0) - 1, col("t"))).as("maxfull")).head()
    assert(geo.getLong(0) >= (1L << 20) && geo.getLong(0) < (1L << 20) + maxDocTok,
      s"full-shard token mass ${geo.getLong(0)} strayed from the 2^20 budget " +
        s"(max single doc $maxDocTok)")
    println(f"compact integrity    ${"check"}%9s       census == capstone, verifyShards clean, replay erased, budget-tight shards  PASS")
    compactManifest.unpersist()
    graft.queries.Similarity.deleteRecursively(compactRoot)
    graft.ops.Release.sweep(spark)

    // HYBRID RETRIEVAL (E10) at 100k zipf docs + planted verbatim
    // twins: with a 50k-token vocabulary the posting-list join is
    // SELECTIVE (the regime real corpora live in — the oracle row's
    // 31-word corpus is the dense worst case), and each query's twin
    // must come back fused-rank-1 in ~every case (cosine exactly 1.0
    // guarantees vec rank 1; BM25 rank 1 is probabilistic only when a
    // third doc out-scores the query's own term profile).
    val nHy = 100000L
    val hyBase = zipfDocs(spark, nHy)
    val hyTwins = hyBase.filter(col("doc_id") % 5000 === 0)
      .select((col("doc_id") + nHy).as("doc_id"), col("text"))
    val hyDocs = hyBase.unionByName(hyTwins)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hyTotal = hyDocs.count()
    val (hyTop, tHy) = time {
      Graft.hybridSearch(hyDocs, qMod = 5000L, poolK = 20, k = 10)
        .filter(col("q_id") < nHy && col("rank") === 1)
        .agg(count(lit(1)).as("n"),
          sum(when(col("doc_id") === col("q_id") + nHy, 1L).otherwise(0L)).as("twin"),
          sum(when(col("rank_vec") === 1, 1L).otherwise(0L)).as("vec1")).head()
    }
    val nHyQ = nHy / 5000
    println(f"hybrid search        $hyTotal%9d docs  $tHy%7.1f s  ${hyTotal / tHy}%9.0f docs/s  ($nHyQ queries, twin fused-top1 ${hyTop.getLong(1)})")
    assert(hyTop.getLong(0) == nHyQ,
      s"${hyTop.getLong(0)} fused lists vs $nHyQ queries")
    assert(hyTop.getLong(1) >= nHyQ * 9 / 10,
      s"planted twins fused-top1 only ${hyTop.getLong(1)}/$nHyQ — fusion or a retriever drifted")
    println(f"hybrid twin gate     ${"check"}%9s       ${hyTop.getLong(1)}/$nHyQ twins fused rank 1 (>= 90%%)  PASS")

    // E10b: the BUCKETED vector-candidate path at REALISTIC dims
    // (d = 2^16 — where the dense form's shared-dims join is the scale
    // question the verdicts flagged): sign-random-projection buckets
    // in the sparse format, exact rescore on survivors. A verbatim
    // twin shares every projection sign, so the planted gate carries
    // over: twins must still fuse rank 1 through REAL buckets
    // (8 tables × 6 bits).
    val (hyLshTop, tHyLsh) = time {
      Graft.hybridSearchLsh(hyDocs, qMod = 5000L, poolK = 20, k = 10,
        dims = 1 << 16, tables = 8, bits = 6)
        .filter(col("q_id") < nHy && col("rank") === 1)
        .agg(count(lit(1)).as("n"),
          sum(when(col("doc_id") === col("q_id") + nHy, 1L).otherwise(0L)).as("twin"))
        .head()
    }
    println(f"hybrid lsh (2^16 d)  $hyTotal%9d docs  $tHyLsh%7.1f s  ${hyTotal / tHyLsh}%9.0f docs/s  ($nHyQ queries, twin fused-top1 ${hyLshTop.getLong(1)})")
    assert(hyLshTop.getLong(0) == nHyQ,
      s"${hyLshTop.getLong(0)} fused lists vs $nHyQ queries")
    assert(hyLshTop.getLong(1) >= nHyQ * 9 / 10,
      s"planted twins fused-top1 only ${hyLshTop.getLong(1)}/$nHyQ through " +
        "buckets — candidate generation dropped true neighbors")
    println(f"hybrid lsh gate      ${"check"}%9s       ${hyLshTop.getLong(1)}/$nHyQ twins fused rank 1 through real buckets at d=65536  PASS")
    hyDocs.unpersist()
    graft.ops.Release.sweep(spark)

    // Incremental PQ append at 1M base vectors (E8), reusing the same
    // corpus: the claim under test is the COST SHAPE — growing a
    // trained index by a nightly batch prices one batch-sized encode
    // (plus an ids-only disjointness probe), never the corpus-sized
    // 1+m KMeans fits + full encode a rebuild pays. The 10k planted
    // twins play the nightly batch; they exist ONLY in the appended
    // rows, so a search that finds them proves the appended rows are
    // live in the served index (not just counted).
    val twinBatch = semAll.filter(col("vec_id") >= nSem)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTwins = twinBatch.count()
    val (apIdx, tApBuild) = time {
      val idx = graft.queries.Similarity.buildPqIndex(
        semBase, cells = 64, m = 4, ksub = 16, dims = vDims, maxIter = 4)
      idx.index.count() // materialize the persisted encode
      idx
    }
    println(f"pq build             $nSem%9d vecs  $tApBuild%7.1f s  ${nSem / tApBuild}%9.0f vecs/s  (cells=64 m=4 ksub=16)")
    val (grown, tApAppend) = time {
      val g = graft.queries.Similarity.appendToPqIndex(apIdx, twinBatch)
      val n = g.index.agg(sum(col("cell")), count(lit(1))).head().getLong(1)
      assert(n == nSem + nTwins,
        s"appended index holds $n rows, expected ${nSem + nTwins}")
      g
    }
    println(f"pq append            $nTwins%9d vecs  $tApAppend%7.1f s  ${nTwins / tApAppend}%9.0f vecs/s  (batch encode + ids-only guard)")
    assert(tApAppend <= tApBuild / 3.0,
      f"append $tApAppend%.1f s is not clearly cheaper than rebuild $tApBuild%.1f s — " +
        "the no-refit path is paying corpus-scale work")
    // Served-index census: each sampled original's twin (cos ~0.9999,
    // present only via the append) must come back as the top neighbor.
    // Allowance: a twin legitimately escapes when the pair straddles a
    // cell boundary and the twin's cell falls outside the probe set.
    val apQueries = semBase.filter(col("vec_id") % 1000 === 0)
    val top1 = graft.queries.Similarity.searchPqIndex(
        grown, semAll, apQueries, probes = 4, rescore = 50)
      .filter(col("rank") === 1)
      .agg(count(lit(1)).as("n"),
        sum(when(col("neighbor_id") === col("q_id") + nSem, 1L).otherwise(0L))
          .as("hit"))
      .head()
    val (nQ, nHit) = (top1.getLong(0), top1.getLong(1))
    println(f"pq append recall     $nQ%9d queries      twin top-1 $nHit ( ${100.0 * nHit / nQ}%.1f%% )")
    assert(nQ == nSem / 1000 && nHit >= nQ * 9 / 10,
      s"appended twins not served: $nHit/$nQ queries returned their twin top-1")
    println(f"pq append gates      ${"check"}%9s       append <= build/3, twins served >= 90%%  PASS")

    // --- D28 incremental semantic dedup: the 1M base corpus plays the
    // lake (cells SAMPLE-fitted at 1% — the 100 TB fit path — then
    // assigned ONCE, offline, into the per-cell state), the 10k twins
    // arrive as the nightly batch. Two gates:
    //   correctness — the batch-sided restricted probe must equal FULL
    //   frozen SemDeDup over the 1.01M union filtered to batch ids,
    //   row for row (the losslessness the driver row proves at oracle
    //   SF, re-proved here at 1M under a sample fit);
    //   cost — the batch pass must beat the full re-run by 2x+ (the
    //   D27 batch-cost-gate pattern at embedding granularity): full
    //   pays union assignment + Σocc² pairing, the batch pass pays 10k
    //   assignments + one cell-join against the stored lake.
    val (d28Cents, tD28Fit) = time {
      graft.queries.Similarity.fitSemanticCells(
        semBase, cells = 1000, seed = 0xC0FFEEL, fitFraction = 0.01,
        what = "scaleprobe-d28")
    }
    println(f"semdedup-inc fit     $nSem%9d vecs  $tD28Fit%7.1f s  (k=1000 on the 1%% seeded draw)")
    val (lakeAssigned, tD28Lake) = time {
      val a = graft.queries.Similarity
        .assignSemanticCellsFrozen(semBase, d28Cents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      a.count()
      a
    }
    println(f"semdedup-inc lake    $nSem%9d vecs  $tD28Lake%7.1f s  ${nSem / tD28Lake}%9.0f vecs/s  (one-time offline assign)")
    val (d28Out, tD28Batch) = time {
      val o = graft.queries.Similarity.semanticDedupIncrementalAssigned(
          twinBatch, lakeAssigned, d28Cents, minCosine = 0.99)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      o.count()
      o
    }
    println(f"semdedup-inc batch   $nTwins%9d vecs  $tD28Batch%7.1f s  ${nTwins / tD28Batch}%9.0f vecs/s  (restricted probe)")
    val (d28Full, tD28Full) = time {
      val f = graft.queries.Similarity
        .semanticDedupFrozen(semAll, d28Cents, minCosine = 0.99)
        .filter(col("vec_id") >= nSem)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      f.count()
      f
    }
    println(f"semdedup-inc full    ${nSem + nTwins}%9d vecs  $tD28Full%7.1f s  (full union re-run, batch slice)")
    val d28Diff = d28Out.exceptAll(d28Full).count() + d28Full.exceptAll(d28Out).count()
    assert(d28Diff == 0L,
      s"D28 restricted probe diverged from the full union re-run on $d28Diff rows")
    val d28Drops = d28Out.agg(sum(lit(1L) - col("kept"))).head().getLong(0)
    // each twin pairs with its base at cos ~0.9999; the batch (twin)
    // member drops only when it is the more-central one, so drops land
    // well inside (0, planted] — a sanity bracket, not an exact census
    assert(d28Drops > 0L && d28Drops <= nTwins,
      s"D28 flagged $d28Drops of $nTwins planted twins — outside (0, planted]")
    assert(tD28Batch <= tD28Full / 2.0,
      f"D28 batch pass $tD28Batch%.1f s is not clearly cheaper than the " +
        f"full re-run $tD28Full%.1f s — the restricted probe is paying lake-scale work")
    println(f"semdedup-inc gates   ${"check"}%9s       batch == full slice ($d28Drops flagged), " +
      f"$tD28Batch%.1f s <= ${tD28Full / 2.0}%.1f s  PASS")
    d28Out.unpersist()
    d28Full.unpersist()
    lakeAssigned.unpersist()

    twinBatch.unpersist()
    apIdx.release()
    semAll.unpersist()
    semBase.unpersist()
    graft.ops.Release.sweep(spark)

    // --- D22 fuzzy join at scale: 2×nDocs master names, nDocs/5 dirty.
    // Names are 12 random letters (26^12 space), so cross-source
    // matches within dist 2 have probability ~0 and the planted
    // one-char deletions are EXACTLY the expected pair set — the
    // census is exact. The claim under test: candidate generation is
    // the deletion-neighborhood equi-join (~1+12+66 keys/string),
    // never the dirty×master cross product (2e11 pairs here).
    val fzAlpha = lit(('a' to 'z').map(_.toString).toArray)
    def fzName(seed: Column): Column =
      concat((0 until 12).map(p =>
        element_at(fzAlpha,
          (pmod(xxhash64(seed * 131L + p), lit(26L)) + 1).cast("int"))): _*)
    val nMaster = 2L * nDocs
    val master = spark.range(nMaster)
      .select(fzName(col("id")).as("mname"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDirty = (master.count() + 9) / 10 // materialize; ids 0,10,… corrupted
    val dirty = spark.range(nMaster).filter(col("id") % 10 === 0)
      .select(col("id").as("mid"), fzName(col("id")).as("name"))
      .select(expr(
        """concat(substring(name, 1, CAST(pmod(mid, 12) AS INT)),
           substring(name, CAST(pmod(mid, 12) AS INT) + 2, 12))""").as("name"))
    val (fzAgg, tFz) = time {
      Graft.fuzzyJoin(dirty, "name", master, "mname", maxDist = 2)
        .agg(count(lit(1)).as("n"),
          sum(when(col("dist") === 1L, 1L).otherwise(0L)).as("d1"),
          count_distinct(col("dirty_name")).as("nd")).head()
    }
    println(f"fuzzy join           $nMaster%9d mstr  $tFz%7.1f s  ${nMaster / tFz}%9.0f rows/s  (${fzAgg.getLong(0)} pairs from $nDirty dirty)")
    // allowance: ~1e11 dirty×master cross pairs at P(lev<=2)~1e-12 per
    // random pair expect ~0.1 accidental matches per run — a hard
    // equality would flake ~1 run in 10 on a CORRECT join
    assert(fzAgg.getLong(0) >= nDirty && fzAgg.getLong(0) <= nDirty + 5 &&
      fzAgg.getLong(1) >= nDirty && fzAgg.getLong(2) == nDirty,
      s"fuzzy census: (pairs, dist1, dirty-matched) = $fzAgg vs $nDirty planted " +
        "one-char deletions — blocking is dropping or manufacturing pairs")
    println(f"fuzzy join census    ${"check"}%9s       every planted deletion matched at dist 1 (${fzAgg.getLong(0) - nDirty} accidental)  PASS")
    master.unpersist()

    // --- B15 time-series pairs at scale: nDocs users × 30-day integer
    // series, daily cents hash-uniform in [0, 2e6) so totals spread
    // across ~11k grid cells (the regime the total-sum blocking is
    // for); every 100th user gets a twin differing by exactly ONE cent
    // on day 7. At eps = 10^6 a random pair's dist² (~30·(8e5)² ≈
    // 2·10¹³) can never qualify, so the expected pair set is EXACTLY
    // the planted twins at dist² = 1 — found even when the one-cent
    // twin straddles a cell edge (the adjacent-cell probe).
    val nSu = nDocs
    def dayCents(seed: Column, i: Column): Column =
      pmod(xxhash64(seed * 8191L + i), lit(2000000L))
    val suBase = spark.range(nSu).select(col("id").as("user_id"),
      transform(sequence(lit(1), lit(30)), i => dayCents(col("id"), i)).as("s"))
    val suTwin = spark.range(nSu).filter(col("id") % 100 === 0)
      .select((col("id") + nSu).as("user_id"),
        transform(sequence(lit(1), lit(30)), i =>
          dayCents(col("id"), i) + when(i === 7, 1L).otherwise(0L)).as("s"))
    // feed seriesPairs through its events-shaped contract: one event
    // per (user, day) at value = cents/100 (cents/100.0 re-quantizes
    // exactly: round(x/100*100) == x for these magnitudes)
    val suEvents = suBase.unionByName(suTwin)
      .select(col("user_id"), posexplode(col("s")).as(Seq("day", "cents")))
      .select(col("user_id"),
        expr("timestamp_micros(CAST((19723 + day) AS BIGINT) * 86400000000)").as("ts"),
        (col("cents").cast("double") / 100.0).as("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSuEvents = suEvents.count()
    val nTwinsSu = (nSu + 99) / 100
    val (suAgg, tSu) = time {
      Graft.seriesPairs(suEvents, eps = 1000000L)
        .agg(count(lit(1)).as("n"),
          sum(when(col("dist2") === 1L, 1L).otherwise(0L)).as("d1"),
          sum(when(col("u2") === col("u1") + nSu, 1L).otherwise(0L)).as("tw"))
        .head()
    }
    println(f"series pairs         ${nSu + nTwinsSu}%9d usrs  $tSu%7.1f s  ${(nSu + nTwinsSu) / tSu}%9.0f usrs/s  (${suAgg.getLong(0)} pairs from $nSuEvents day-events)")
    assert(suAgg.getLong(0) == nTwinsSu && suAgg.getLong(1) == nTwinsSu &&
      suAgg.getLong(2) == nTwinsSu,
      s"series census: (pairs, dist1, twin-paired) = $suAgg vs $nTwinsSu planted " +
        "one-cent twins — grid blocking dropped or manufactured pairs")
    println(f"series pair census   ${"check"}%9s       every planted one-cent twin found at dist² = 1, nothing else  PASS")
    suEvents.unpersist()

    // --- D23 triangles at scale: nDocs/2 disjoint K3 "orders" (parts
    // 3k, 3k+1, 3k+2) chained by 2-part orders (3k+2, 3k+3) that close
    // nothing — the expected census is EXACT: one triangle per K3,
    // every triangle node in exactly 1, every pure-chain contribution 0.
    // The claim under test: the per-edge adjacency-intersect plan
    // (wedge-free) holds its bound on a multi-million-edge graph.
    val nTriK = nDocs / 2
    val k3 = spark.range(nTriK).select(col("id").as("o"),
      explode(array(col("id") * 3, col("id") * 3 + 1, col("id") * 3 + 2)).as("p"))
    val triChain = spark.range(nTriK - 1).select((col("id") + nTriK).as("o"),
      explode(array(col("id") * 3 + 2, col("id") * 3 + 3)).as("p"))
    val triLineitem = k3.unionByName(triChain)
      .select(col("o").as("l_orderkey"), col("p").as("l_partkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    triLineitem.count()
    val (triAgg, tTri) = time {
      Graft.triangles(triLineitem)
        .agg(sum(col("n_tri")).as("mass"),
          sum(when(col("n_tri") === 1L, 1L).otherwise(0L)).as("n1"),
          count(lit(1)).as("nodes")).head()
    }
    val triNodes = 3L * nTriK
    println(f"triangles            ${triNodes}%9d node  $tTri%7.1f s  ${triNodes / tTri}%9.0f nodes/s  (${triAgg.getLong(0) / 3} triangles)")
    assert(triAgg.getLong(0) == 3L * nTriK && triAgg.getLong(1) == triNodes &&
      triAgg.getLong(2) == triNodes,
      s"triangle census: (mass, ones, nodes) = $triAgg vs $nTriK planted K3s — " +
        "orientation dropped or manufactured triangles")
    println(f"triangle census      ${"check"}%9s       one triangle per planted K3, chains close nothing  PASS")
    triLineitem.unpersist()

    // --- D24 label propagation at scale: 5-cliques (parts 5k..5k+4
    // per order) bridged by 2-part orders (5k+4, 5k+5). The expected
    // census is EXACT (hand-simulated): one round pulls each bridge
    // head toward its neighbor clique, round 2 snaps it back (clique
    // votes dominate the single bridge vote), and from round 2 the
    // labeling is STABLE at every node = its clique minimum — so at
    // the default 5 iterations every community is one 5-clique.
    // The design point is pinned ABOVE the broadcast-labels bound
    // (240,001 cliques = 1,200,005 nodes > LabelPropagation's
    // broadcastLabelsBelow = 1e6), so every round runs the labels⋈edges
    // JOIN fallback — the regime a 100× graph actually runs in; the
    // round-11 probe (500k nodes) only ever exercised the broadcast
    // path. Claims under test: the per-round join + two-phase argmax
    // holds on a ~2.6M-edge graph without merging bridged communities,
    // in the fallback plan shape.
    val nLpaK = math.max(nDocs / 5, 240001L)
    val cliq = spark.range(nLpaK).select(col("id").as("o"),
      explode(array((0 to 4).map(i => col("id") * 5 + i): _*)).as("p"))
    val lpaBridge = spark.range(nLpaK - 1).select((col("id") + nLpaK).as("o"),
      explode(array(col("id") * 5 + 4, col("id") * 5 + 5)).as("p"))
    val lpaLineitem = cliq.unionByName(lpaBridge)
      .select(col("o").as("l_orderkey"), col("p").as("l_partkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lpaLineitem.count()
    val (lpaAgg, tLpa) = time {
      Graft.communities(lpaLineitem)
        .agg(
          sum(when(col("community") === col("part") - pmod(col("part"), lit(5L)),
            1L).otherwise(0L)).as("at_min"),
          sum(when(col("community_size") === 5L, 1L).otherwise(0L)).as("size5"),
          count(lit(1)).as("nodes")).head()
    }
    val lpaNodes = 5L * nLpaK
    println(f"lpa communities      ${lpaNodes}%9d node  $tLpa%7.1f s  ${lpaNodes / tLpa}%9.0f nodes/s  ($nLpaK communities)")
    assert(lpaAgg.getLong(0) == lpaNodes && lpaAgg.getLong(1) == lpaNodes &&
      lpaAgg.getLong(2) == lpaNodes,
      s"lpa census: (at_min, size5, nodes) = $lpaAgg vs $nLpaK bridged " +
        "5-cliques — communities merged across bridges or failed to converge")
    println(f"lpa census           ${"check"}%9s       every bridged 5-clique labeled by its minimum, none merged  PASS")
    lpaLineitem.unpersist()

    // --- D21b maximal duplicate lengths at scale: nDocs/10 doc PAIRS,
    // pair i sharing EXACTLY L_i = 20 + (i mod 200) chars (md5-block
    // content — no accidental 20-gram repeats at these scales — then a
    // forced 'A'/'B' divergence char and unique md5 tails). Expected
    // census is EXACT per span: [1, L] extents, n_dup_grams = L - 19,
    // max_dup_len = L, and the L histogram uniform over 20..219. The
    // claim under test: the group-local adjacent-LCP reconstruction
    // reports the exact planted length for every span at corpus scale,
    // across 200 distinct lengths straddling every ladder rung.
    val nMaxPairs = math.max(200L, nDocs / 10 / 200 * 200)
    val maxBase = spark.range(nMaxPairs).select(col("id").as("i"),
      (lit(20) + pmod(col("id"), lit(200))).cast("int").as("len"))
    def mdBlocks(salt: String, n: Int) = concat((0 until n).map(t =>
      md5(concat_ws("_", col("i"), lit(salt), lit(t)))): _*)
    val maxPrefix = mdBlocks("p", 7).substr(lit(1), col("len"))
    val maxDocs = maxBase.select(col("i"), concat(maxPrefix, lit("A"),
        md5(concat_ws("_", col("i"), lit("ta")))).as("text"))
      .select((col("i") * 2).as("doc_id"), col("text"))
      .unionByName(maxBase.select(col("i"), concat(maxPrefix, lit("B"),
        md5(concat_ws("_", col("i"), lit("tb")))).as("text"))
        .select((col("i") * 2 + 1).as("doc_id"), col("text")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    maxDocs.count()
    val (mAgg, tMax) = time {
      Graft.dupSpansMaximal(maxDocs)
        .agg(count(lit(1)).as("n"),
          sum(when(col("span_start") === 1L &&
            col("max_dup_len") === col("span_end") &&
            col("n_dup_grams") === col("span_end") - 19L, 1L).otherwise(0L))
            .as("exact"),
          min(col("max_dup_len")).as("lmin"),
          max(col("max_dup_len")).as("lmax"),
          countDistinct(col("max_dup_len")).as("nlen")).head()
    }
    val nMaxDocs = 2L * nMaxPairs
    println(f"maximal dup lengths  ${nMaxDocs}%9d docs  $tMax%7.1f s  ${nMaxDocs / tMax}%9.0f docs/s  (${mAgg.getLong(0)} spans, 200 planted lengths)")
    assert(mAgg.getLong(0) == nMaxDocs && mAgg.getLong(1) == nMaxDocs &&
      mAgg.getLong(2) == 20L && mAgg.getLong(3) == 219L &&
      mAgg.getLong(4) == 200L,
      s"maximal-length census: (n, exact, lmin, lmax, nlen) = $mAgg vs " +
        s"$nMaxDocs planted spans at lengths 20..219 — LCP reconstruction " +
        "mis-measured a planted length")
    println(f"maximal len census   ${"check"}%9s       every planted span reports its exact length, 20..219 all hit  PASS")
    maxDocs.unpersist()

    // --- E14 Lloyd k-means at scale: nDocs vectors in 32 PLANTED
    // clusters (one-hot ±8 centers — pairwise distance 8√2, far past
    // the ±0.1 deterministic jitter), vec i in cluster i mod 32 so the
    // first-k init seeds one vector per cluster. After 3 iterations
    // the fit must recover the plant EXACTLY: every cluster's n_vecs
    // equals its planted share and every centroid lands within 0.05 of
    // its planted center (the jitter averages out). The claim under
    // test: the broadcast-argmin + fixed-point-update rounds hold
    // their shape and exactness on a corpus-scale fit.
    val kmK = 32
    val kmVecs = spark.range(nDocs).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        (when(d === pmod(col("id"), lit(kmK.toLong)).cast("int"), lit(8.0))
          .otherwise(lit(0.0)) +
          (pmod(xxhash64(col("id"), d), lit(1000L)).cast("double") / 1000.0
            - 0.5) * 0.2).cast("float")).as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    kmVecs.count()
    val (kmAgg, tKm) = time {
      val m = Graft.kmeansLloyd(kmVecs, k = kmK, iters = 3)
      m.agg(
        sum(when(col("n_vecs") === lit(nDocs / kmK) ||
          col("n_vecs") === lit(nDocs / kmK + 1), 1L).otherwise(0L)).as("share_ok"),
        // centroid check: the one-hot dim must read ~8, others ~0
        sum(when(
          (col("dim") === col("c_id") && abs(col("centroid") - 8.0) < 0.05) ||
          (col("dim") =!= col("c_id") && abs(col("centroid")) < 0.05),
          1L).otherwise(0L)).as("cent_ok"),
        count(lit(1)).as("cells")).head()
    }
    println(f"kmeans lloyd         $nDocs%9d vecs  $tKm%7.1f s  ${nDocs / tKm}%9.0f vecs/s  ($kmK planted clusters, 3 iterations)")
    assert(kmAgg.getLong(2) == kmK * 64L && kmAgg.getLong(0) == kmK * 64L &&
      kmAgg.getLong(1) == kmK * 64L,
      s"kmeans census: (share_ok, cent_ok, cells) = $kmAgg vs ${kmK * 64} — " +
        "the fit failed to recover the planted clusters")
    println(f"kmeans census        ${"check"}%9s       all $kmK planted clusters recovered, centroids within 0.05  PASS")
    kmVecs.unpersist()

    // --- C23 bigram LM at scale: the model key space is bounded by the
    // observed bigram vocabulary (≤ 50² here; ≤ corpus bigram types in
    // general — aggregated, never windowed), the threshold pass by the
    // xent RANGE. Census: every ≥2-token doc scored, terciles split the
    // corpus into three comparable buckets.
    val (blAgg, tBl) = time {
      Graft.bigramLm(docs)
        .agg(count(lit(1)).as("n"),
          sum(when(col("ppl_bucket") === "head", 1L).otherwise(0L)).as("h"),
          sum(when(col("ppl_bucket") === "tail", 1L).otherwise(0L)).as("t")).head()
    }
    println(f"bigram lm            $total%9d docs  $tBl%7.1f s  ${total / tBl}%9.0f docs/s  (head ${blAgg.getLong(1)} / tail ${blAgg.getLong(2)})")
    assert(blAgg.getLong(0) == total,
      s"bigram LM scored ${blAgg.getLong(0)} of $total docs")
    assert(blAgg.getLong(1) >= total / 6 && blAgg.getLong(2) >= total / 6,
      s"tercile buckets degenerate: $blAgg — threshold pass broke")
    println(f"bigram lm census     ${"check"}%9s       all docs scored, terciles populated  PASS")
    graft.ops.Release.sweep(spark)

    // --- C25 markup extraction at scale: the corpus docs wrapped into
    // HTML pages by the oracle rows' own derived-frame builder (groups
    // of 5, script/style/comment bodies, entities, planted duplicate
    // <li>), then the full extraction chain — ONE codegen map stage, so
    // throughput should be scan-bound. The census is EXACT by the page
    // skeleton's construction: every full page extracts to 11 lines /
    // 5 paragraphs with markup detected (any regex-chain drift at
    // volume breaks a count).
    val exDocs = docs.filter(col("doc_id") < (nDocs / 5) * 5)
    val nPages = nDocs / 5
    val (exAgg, tXt) = time {
      Graft.extractText(graft.queries.Extract.htmlPagesFrom(exDocs))
        .agg(count(lit(1)).as("n"),
          sum(col("had_markup")).as("hm"),
          sum(when(col("n_lines") === 11L && col("n_paras") === 5L, 1L)
            .otherwise(0L)).as("shaped")).head()
    }
    println(f"markup extraction    $nPages%9d page  $tXt%7.1f s  ${nPages / tXt}%9.0f pages/s  (5 corpus docs per page)")
    assert(exAgg.getLong(0) == nPages && exAgg.getLong(1) == nPages &&
      exAgg.getLong(2) == nPages,
      s"extraction census: (pages, had_markup, 11-line/5-para) = $exAgg " +
        s"vs $nPages full pages — the regex chain drifted at volume")
    println(f"extraction census    ${"check"}%9s       every page extracts to the exact planted line/paragraph shape  PASS")
    graft.ops.Release.sweep(spark)

    // --- I10 heavy hitters at scale: the Zipf corpus is the regime the
    // CMS prefilter exists for — a huge tail vocabulary (the naive
    // plan's shuffle) under a hot head (the answer). Census 1: the
    // prefiltered output EQUALS the naive exact aggregation (the
    // losslessness the oracle row proves at sf scale, re-proved at the
    // design point). Census 2: the measured map-side discard — the
    // fraction of gram occurrences whose sketch estimate falls below
    // the threshold and which therefore never reach the exchange;
    // sized so a sketch regression (wrong bucketing, wrong min) shows
    // up as either a broken equality or a collapsed discard rate.
    val hhDocs = zipfDocs(spark, nDocs)
    val hhMin = math.max(50L, nDocs / 100)
    val (hhDepth, hhWidth) = (3, 1 << 15)
    // ONE operator run: heavyHitters() builds the sketch eagerly at
    // call time, so time{} wraps the call itself and the returned
    // frame (cheap plan, no second build) feeds both census counts
    val (got, tHh) = time {
      val f = graft.queries.Sketches
        .heavyHitters(hhDocs, hhMin, 2, hhDepth, hhWidth)
      f.count() // materialize probe+rescore inside the timing
      f
    }
    val hhGrams = graft.queries.Sketches.gramsOf(hhDocs, 2)
    val naiveHh = hhGrams.groupBy("gram").agg(count(lit(1)).as("n"))
      .filter(col("n") >= hhMin)
    // symmetric-diff census: both sides key one row per gram, so
    // every (gram, n) appearing != 2 times is a divergence; diff == 0
    // implies the frames are equal as sets (counts included)
    val diff = got.select("gram", "n")
      .unionByName(naiveHh.select("gram", "n"))
      .groupBy("gram", "n").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 2L).count()
    assert(diff == 0L,
      s"heavy-hitter census: CMS output diverges from naive exact ($diff rows differ)")
    val hhRows = naiveHh.count()
    val est = graft.queries.Sketches.cmsEstimator(hhDocs, 2, hhDepth, hhWidth)
    val surv = hhGrams.agg(
      count(lit(1)).as("total"),
      sum(when(est(col("gram")) >= hhMin, 1L).otherwise(0L)).as("surv")).head()
    val (hhTotal, hhSurv) = (surv.getLong(0), surv.getLong(1))
    val discardPct = 100.0 * (hhTotal - hhSurv) / hhTotal
    println(f"heavy hitters        $hhTotal%9d gram  $tHh%7.1f s  ${hhTotal / tHh}%9.0f gram/s  ($hhRows heavy @ >=$hhMin; sketch discards $discardPct%.1f%% of occurrences map-side)")
    assert(discardPct >= 50.0,
      f"CMS prefilter discards only $discardPct%.1f%% on a Zipf corpus — the sketch stopped discriminating (width $hhWidth, depth $hhDepth, threshold $hhMin)")
    println(f"heavy-hitter census  ${"check"}%9s       CMS == naive exact; map-side discard $discardPct%.1f%%  PASS")
    graft.ops.Release.sweep(spark)

    spark.stop()
  }
}
