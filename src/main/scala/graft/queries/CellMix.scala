package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Shards.{ScrambleA, ScrambleP}

/** H15 — per-cell mixing: the consumer the I12 corpus map exists for
  * (the r13 verdict's named gap: "I12's census has no consumer").
  * H6's domain mixer rebalances token mass across a COLUMN group
  * (lang, source); this one rebalances across the corpus map's OWN
  * two-axis grid — (content cell × quality decile) — so a mix
  * designer can act on the census directly: downsample the
  * over-represented (cell, decile) combinations toward a target token
  * share, with NO metadata column required (the grid is learned from
  * the corpus's own embeddings + quality scores).
  *
  * Targets: by default each observed (cell, decile) group gets a
  * uniform token share (the H6 convention — target = t_tokens / k);
  * callers pass a `targets` frame (cell, decile, share) for designed
  * mixes (e.g. "give decile-9 cells 3× their natural share"). A
  * group's keep-rate is min(1, target_tokens / g_tokens) and each
  * doc's keep/drop draw is the portable LCG scramble every sampler
  * here uses — reproducible run to run and engine to engine, no RNG
  * state anywhere. Rates only DOWN-sample (the H6 contract); shares
  * that imply up-sampling clamp at 1.0 (epochs handle repetition —
  * the H13 curriculum's job, not the mixer's).
  *
  * Determinism: rates are a fixed sequence of IEEE ops over exact
  * integer stats; the keep test compares the integer scramble
  * (< 2^30, exact as a double) against rate·P — the H6 argument,
  * verbatim.
  *
  * Scale shape: the (cell, decile) placement is I12's docCells frame
  * (broadcast-centroid assignment + bounded-histogram deciles — text
  * never shuffles); group stats are one map-side-combinable agg over
  * ≤ cells×10 keys; the rate frame broadcasts back onto a pure
  * map-filter. The mixer adds NO corpus-wide shuffle beyond what the
  * census itself runs. At 100 TB: `fitFraction` < 1 sample-fits the
  * cells (the I12 path) and everything downstream is map-side.
  */
object CellMix {

  /** Per-doc mix frame: (doc_id, cell, decile, n_tokens, rate, keep).
    * `targets` = (cell, decile, share) rows with share summing to ~1
    * over the groups the caller wants kept; groups absent from a
    * supplied `targets` frame get share 0 (dropped entirely) — the
    * excision arm of the census's "excise it or reweight it" read. */
  def cellMix(
      docs: DataFrame,
      dims: Int = CorpusMap.MapDims,
      cells: Int = CorpusMap.MapCells,
      iters: Int = CorpusMap.MapIters,
      fitFraction: Double = 1.0,
      targets: Option[DataFrame] = None): DataFrame = {
    val per = CorpusMap.docCells(docs, dims, cells, iters, fitFraction)
      .withColumn("scramble",
        (((col("doc_id") % ScrambleP) * ScrambleA) % ScrambleP)
          .cast("double"))
    val rated = ratedOf(per, targets)
    per.join(broadcast(rated), Seq("cell", "decile"))
      .withColumn("keep",
        col("scramble") < col("rate") * lit(ScrambleP.toDouble))
      .select(col("doc_id"), col("cell"), col("decile"), col("n_tokens"),
        col("rate"), col("keep"))
  }

  /** The per-group rate frame (cell, decile, rate) from any per-doc
    * (cell, decile, n_tokens) frame — factored from [[cellMix]] so the
    * frozen-state path ([[fitRates]]/[[mixFrozen]]) derives the SAME
    * arithmetic (the one-fragment discipline). */
  private def ratedOf(per: DataFrame, targets: Option[DataFrame]): DataFrame = {
    val gstats = per.groupBy("cell", "decile")
      .agg(sum(col("n_tokens")).as("g_tokens"))
    // windows over the ≤ cells×10-row stats frame only (the H6
    // bounded-window argument), never the corpus
    val w = Window.partitionBy()
    targets match {
      case None =>
        gstats
          .withColumn("k", count(lit(1)).over(w))
          .withColumn("t_tokens", sum(col("g_tokens")).over(w))
          .withColumn("rate", least(lit(1.0),
            (col("t_tokens").cast("double") *
              (lit(1.0) / col("k").cast("double"))) /
              col("g_tokens").cast("double")))
          .select(col("cell"), col("decile"), col("rate"))
      case Some(t) =>
        gstats
          .withColumn("t_tokens", sum(col("g_tokens")).over(w))
          .join(broadcast(t.select(col("cell"), col("decile"),
            col("share").cast("double").as("share"))),
            Seq("cell", "decile"), "left")
          .withColumn("rate", least(lit(1.0),
            (col("t_tokens").cast("double") *
              coalesce(col("share"), lit(0.0))) /
              col("g_tokens").cast("double")))
          .select(col("cell"), col("decile"), col("rate"))
    }
  }

  /** Fit the FROZEN mixing rates on a corpus: the (cell, decile, rate)
    * table as bounded driver model state (≤ cells×10 rows) — the
    * literal half of the G23 streaming mixer's state, beside
    * [[CorpusMap.fitModel]]'s centroids+cuts. Same-corpus contract:
    * `mixFrozen(docs, CorpusMap.fitModel(docs), fitRates(docs))`
    * equals [[cellMix]](docs) BIT-EXACTLY (CellMixSpec pins it) —
    * assignment, rate arithmetic, and the LCG keep draw are all one
    * definition. */
  def fitRates(
      docs: DataFrame,
      dims: Int = CorpusMap.MapDims,
      cells: Int = CorpusMap.MapCells,
      iters: Int = CorpusMap.MapIters,
      fitFraction: Double = 1.0,
      targets: Option[DataFrame] = None): Seq[(Long, Long, Double)] =
    ratedOf(CorpusMap.docCells(docs, dims, cells, iters, fitFraction), targets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  /** Per-doc keep/drop under FULLY FROZEN state — the corpus-map model
    * (centroid + cut literals) AND the rate table, no fit, no
    * aggregation, no shuffle: [[CorpusMap.assignFrozen]]'s pure
    * per-row map plus a rate-map literal lookup and the LCG draw. A
    * streaming plan hosts it as-is
    * ([[graft.streaming.Streams.cellMixStream]] — the G22 argument
    * one step further, closing the census → mixer → live-ingest
    * chain); at 100 TB the whole mixer is one map stage in the scan
    * projection. Groups absent from `rates` get rate 0 (the excision
    * arm, as in [[cellMix]]'s designed-targets path). */
  def mixFrozen(
      docs: DataFrame,
      model: CorpusMap.CorpusMapModel,
      rates: Seq[(Long, Long, Double)]): DataFrame = {
    // deciles are 1..10 — key = cell*16 + decile packs uniquely
    val keys = rates.map { case (c, d, _) => c * 16L + d }.toArray
    val vals = rates.map(_._3).toArray
    val rateMap = map_from_arrays(lit(keys), lit(vals))
    CorpusMap.assignFrozen(docs, model)
      .withColumn("scramble",
        (((col("doc_id") % ScrambleP) * ScrambleA) % ScrambleP)
          .cast("double"))
      .withColumn("rate",
        coalesce(element_at(rateMap, col("cell") * 16L + col("decile")),
          lit(0.0)))
      .withColumn("keep",
        col("scramble") < col("rate") * lit(ScrambleP.toDouble))
      .select(col("doc_id"), col("cell"), col("decile"), col("n_tokens"),
        col("rate"), col("keep"))
  }

  /** A DESIGNED target frame derived from the census itself: each
    * observed (cell, decile) group's token share ∝ its decile — the
    * standard "upweight high quality" mix, with no hand-tuned
    * constants so the oracle can derive the identical shares. */
  private def qualityTargets(docs: DataFrame): DataFrame = {
    val census = CorpusMap.corpusMap(docs)
    // window over the ≤ cells×10-row census only (the H6 argument)
    val w = Window.partitionBy()
    census
      .withColumn("sd", sum(col("decile")).over(w))
      .select(col("cell"), col("decile"),
        (col("decile").cast("double") / col("sd").cast("double"))
          .as("share"))
  }

  /** The per-group mix summary both driver rows report: before/after
    * doc and token mass plus the applied rate — the frame a mix
    * designer diffs against the census. */
  private def mixSummary(mixed: DataFrame): DataFrame =
    mixed.groupBy("cell", "decile")
      .agg(count(lit(1)).as("n_before"),
        sum(col("n_tokens")).as("tok_before"),
        min(col("rate")).as("rate"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_after"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("tok_after"))
      .orderBy("cell", "decile")

  /** The uniform-target driver row. */
  val qCellMix: Q = Q(
    "q_cell_mix",
    (s, d) => mixSummary(cellMix(Tables.documents(s, d))),
    Some(s"""WITH ${CorpusMap.sqlDocCellCtes},
      per AS (
        SELECT doc_id, cell, decile, n_tokens,
          CAST(((doc_id % $ScrambleP) * $ScrambleA) % $ScrambleP AS DOUBLE)
            AS scramble
        FROM doc_cells),
      g AS (SELECT cell, decile, sum(n_tokens) AS g_tokens
        FROM per GROUP BY 1, 2),
      t AS (SELECT count(*) AS k, sum(g_tokens) AS t_tokens FROM g),
      rated AS (
        SELECT cell, decile, LEAST(1.0::DOUBLE,
          (CAST(t_tokens AS DOUBLE) * (1.0::DOUBLE / CAST(k AS DOUBLE)))
            / CAST(g_tokens AS DOUBLE)) AS rate
        FROM g CROSS JOIN t)
      SELECT cell, decile,
        count(*) AS n_before,
        CAST(sum(n_tokens) AS BIGINT) AS tok_before,
        min(rate) AS rate,
        CAST(sum(CASE WHEN scramble < rate * $ScrambleP.0::DOUBLE
          THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
        CAST(sum(CASE WHEN scramble < rate * $ScrambleP.0::DOUBLE
          THEN n_tokens ELSE 0 END) AS BIGINT) AS tok_after
      FROM per JOIN rated USING (cell, decile)
      GROUP BY 1, 2
      ORDER BY 1, 2"""))

  /** The DESIGNED-target driver row — H15's `targets` arm hash-checked
    * end to end: shares ∝ decile (derived from the census itself, so
    * the oracle derives the identical shares with no stashed
    * constants), rate = min(1, t_tokens·share / g_tokens). Proves the
    * custom-targets path — join, share arithmetic, clamping — not
    * just the uniform default. */
  val qCellMixQuality: Q = Q(
    "q_cell_mix_quality",
    (s, d) => {
      val docs = Tables.documents(s, d)
      mixSummary(cellMix(docs, targets = Some(qualityTargets(docs))))
    },
    Some(s"""WITH ${CorpusMap.sqlDocCellCtes},
      per AS (
        SELECT doc_id, cell, decile, n_tokens,
          CAST(((doc_id % $ScrambleP) * $ScrambleA) % $ScrambleP AS DOUBLE)
            AS scramble
        FROM doc_cells),
      g AS (SELECT cell, decile, sum(n_tokens) AS g_tokens
        FROM per GROUP BY 1, 2),
      t AS (SELECT sum(g_tokens) AS t_tokens FROM g),
      sd AS (SELECT sum(decile) AS sd FROM g),
      tg AS (SELECT cell, decile,
          CAST(decile AS DOUBLE) / CAST(sd AS DOUBLE) AS share
        FROM g CROSS JOIN sd),
      rated AS (
        SELECT g.cell, g.decile, LEAST(1.0::DOUBLE,
          (CAST(t_tokens AS DOUBLE) * share) / CAST(g_tokens AS DOUBLE))
            AS rate
        FROM g JOIN tg ON g.cell = tg.cell AND g.decile = tg.decile
        CROSS JOIN t)
      SELECT cell, decile,
        count(*) AS n_before,
        CAST(sum(n_tokens) AS BIGINT) AS tok_before,
        min(rate) AS rate,
        CAST(sum(CASE WHEN scramble < rate * $ScrambleP.0::DOUBLE
          THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
        CAST(sum(CASE WHEN scramble < rate * $ScrambleP.0::DOUBLE
          THEN n_tokens ELSE 0 END) AS BIGINT) AS tok_after
      FROM per JOIN rated USING (cell, decile)
      GROUP BY 1, 2
      ORDER BY 1, 2"""))
}
