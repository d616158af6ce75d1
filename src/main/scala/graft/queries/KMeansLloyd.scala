package graft.queries

import graft.{Q, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E14 — Lloyd's k-means with every iteration ORACLE-EXACT: the house
  * trained-pipeline story so far replays fitted STATE (D15c/E13 inject
  * the fit as literals) or erases the fit's influence (E3b/E7 probe
  * exhaustively); this operator makes the TRAINING LOOP itself
  * reproducible and SQL-replayable, iteration by iteration.
  *
  * Three determinism choices buy that:
  *  - init = the k smallest-vec_id vectors (the D15 deterministic-
  *    centroid convention), not a random sample;
  *  - assignment = nearest centroid by L2 over a fixed-shape IEEE
  *    chain (float→double casts, strict left fold), argmin as the
  *    packed-long map-side `min` (`round(d2·2^30)·2^21 + c_id` —
  *    quantized-distance ties to the smaller c_id, mirrored by the
  *    oracle's ORDER BY);
  *  - update = the E5 fixed-point mean: components quantize to 1/4096
  *    integers, INTEGER-sum per (cell, dim) (exact, commutative,
  *    shuffle-safe — a float sum would be partition-order-dependent
  *    and unreproducible), and the new centroid is one double division
  *    at read time. Empty clusters keep their previous centroid.
  *
  * Scale shape per iteration: one broadcast-centroids nested-loop
  * whose packed argmin collapses map-side (the D15 HashAggregate
  * lesson — nothing shuffles but (vec_id, cell)), then one posexplode
  * + integer agg on the k×dims key space. Centroids are driver-side
  * model state (k·dims doubles — metadata-scale by nature, the same
  * contract as every fitted model here); each iteration's update
  * rides ONE collect of that k×dims frame, never vector data.
  *
  * At 100 TB: iterations cost one corpus pass each (the Lloyd floor);
  * fit on a sample and serve assignments via [[Similarity]]'s IVF/PQ
  * machinery when the full-corpus fit is not the point.
  */
object KMeansLloyd {

  /** Fixed-point scale for centroid components (the E5 constant): ×2^12
    * is an exponent shift — exact — and round-half-away matches across
    * engines. */
  private val CQ = 4096.0

  /** Distance-quantization scale for the packed argmin: 2^30 leaves
    * room for d2 up to ~2^12 before the ·2^21 cell pack nears 2^63;
    * assignment ties within 2^-30 go to the smaller c_id (mirrored in
    * the oracle). */
  private val DQ = (1L << 30).toDouble

  /** Run `iters` Lloyd iterations with k centroids over
    * (vec_id, embedding) and return the fitted model in long format:
    * (c_id, dim, n_vecs, centroid) — n_vecs from the assignment that
    * produced the final centroids.
    *
    * `fitFraction` < 1 runs the WHOLE fit (init, every iteration,
    * the final counts) on the seeded deterministic vec_id draw
    * ([[Similarity.fitFrame]]) — the 100 TB path: each Lloyd
    * iteration is a full pass over its input, so a 1% draw cuts the
    * fit 100× and the returned centroids serve full-corpus
    * assignment via [[Similarity]]'s IVF/PQ machinery. n_vecs then
    * counts SAMPLE members per cell (the fit's own assignment — scale
    * by 1/fitFraction for a population estimate). The q_kmeans oracle
    * row runs the default full fit; sample-vs-prefiltered-frame
    * equality is pinned in SampleFitSpec. */
  def kmeans(
      embeddings: DataFrame,
      k: Int = 8,
      iters: Int = 3,
      fitFraction: Double = 1.0): DataFrame = {
    require(k > 0 && k < (1 << 21) - 1, s"k must be in [1, 2^21), got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val v = Similarity.fitFrame(
      embeddings.select(col("vec_id"), col("embedding")),
      fitFraction, 0L, k, "kmeans")
    val (cents, _, lastCounts) = fitLoop(v, k, iters)
    Similarity.releaseFitFrame(v, fitFraction)
    cents.flatMap { case (cId, emb) =>
      emb.zipWithIndex.map { case (c, d) =>
        (cId, d.toLong, lastCounts.getOrElse(cId, 0L), c)
      }
    }.toDF("c_id", "dim", "n_vecs", "centroid")
      .orderBy("c_id", "dim")
  }

  /** Per-vector cell assignment of the fitted model — `(vec_id, cell)`
    * from the LAST iteration's assignment (the one that produced the
    * final centroids and the model's n_vecs — the same convention the
    * oracle's asg$iters CTE replays). The corpus-map census (I12)
    * consumes this; [[kmeans]] itself returns the model.
    *
    * `fitFraction` < 1 is the 100 TB path the corpus-map doc promises:
    * the WHOLE Lloyd fit (init + every iteration) runs on the seeded
    * deterministic draw ([[Similarity.fitFrame]] — same guards, same
    * reproducibility argument), then EVERY vector is assigned once
    * under the FINAL centroids (one broadcast-argmin pass — the only
    * stage that must see the full corpus). At the default 1.0 the
    * returned frame is bit-identical to the oracle's asg$iters CTE;
    * under a sample fit the full-corpus assignment uses cents$iters
    * (the fitted model), the standard fit-on-sample/assign-everything
    * convention — SampleFitSpec pins sample==prefiltered-frame
    * equality of the model itself. */
  def assignments(
      embeddings: DataFrame,
      k: Int = 8,
      iters: Int = 3,
      fitFraction: Double = 1.0): DataFrame = {
    // the kmeans() guards, mirrored: a k past the 2^21 packed-argmin
    // domain silently corrupts cell ids via pmod collisions, and
    // iters = 0 would return the null lastAssigned frame (advisor r13)
    require(k > 0 && k < (1 << 21) - 1, s"k must be in [1, 2^21), got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val v = embeddings.select(col("vec_id"), col("embedding"))
    if (fitFraction >= 1.0) fitLoop(v, k, iters)._2
    else {
      val s = Similarity.fitFrame(v, fitFraction, 0L, k, "kmeansAssign")
      val (cents, _, _) = fitLoop(s, k, iters)
      Similarity.releaseFitFrame(s, fitFraction)
      assignStep(v, cents)
    }
  }

  /** The Lloyd loop shared by [[kmeans]] and [[assignments]]:
    * (final centroids, last-iteration assignment frame, last counts).
    * Accepts float OR double embedding arrays (both cast to double in
    * the distance chain — the corpus-map path feeds exact-integer-
    * derived unit DOUBLE vectors, the E14 row the parquet floats). */
  private def fitLoop(v: DataFrame, k: Int, iters: Int)
      : (Seq[(Long, Array[Double])], DataFrame, Map[Long, Long]) = {
    val spark = v.sparkSession
    import spark.implicits._
    // init: the k smallest vec_ids, re-keyed dense (correct on any id
    // space — the D15 rank lesson), components as exact doubles
    val initRows = v.orderBy(col("vec_id")).limit(k)
      .collect().sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) =>
        (i.toLong, r.getSeq[Number](1).map(_.doubleValue()).toArray)
      }.toSeq
    require(initRows.nonEmpty, "kmeans: empty input")

    var cents: Seq[(Long, Array[Double])] = initRows
    var lastAssigned: DataFrame = null
    var lastCounts: Map[Long, Long] = Map.empty
    // Exact early stop (r16, guide §2.4 — remove work outright): once
    // an update leaves every centroid BIT-IDENTICAL to the previous
    // iteration, the fit is at an exact fixed point — assignment
    // depends only on the centroids, so every further iteration would
    // recompute the same assignment, the same quantized sums, and the
    // same centroids. Skipping those iterations changes nothing the
    // fixed-iteration oracle CTEs could observe (their extra
    // iterations replay the identical state), and saves one full-pass
    // aggregation job per skipped iteration on fits called with a
    // generous budget (the PQ/OPQ maxIter=20 disk build).
    var converged = false
    for (_ <- 1 to iters if !converged) {
      val assigned = assignStep(v, cents)
      lastAssigned = assigned
      // E5 fixed-point update: quantize once, integer-sum per
      // (cell, dim) — one collect of the k×dims model frame. On the
      // literal-assignment path the cell is a per-row expression, so
      // the sums pass needs NO join back to the assignment frame —
      // each iteration is ONE map + k×dims-key combinable agg, with
      // no corpus-sized exchange at all (guide §2.4).
      val sumSrc =
        if (litAssignable(cents))
          v.select(packedMin(col("embedding"), cents).as("cell"),
            col("embedding"))
        else v.join(assigned, Seq("vec_id"))
      val sums = sumSrc
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("cell"), col("dim"),
          round(col("x").cast("double") * lit(CQ)).cast("long").as("q"))
        .groupBy("cell", "dim")
        .agg(count(lit(1)).as("n"), sum(col("q")).as("qsum"))
        .collect()
      val byCell = sums.groupBy(_.getLong(0))
      lastCounts = byCell.map { case (c, rows) => c -> rows.head.getLong(2) }
      val next = cents.map { case (cId, prev) =>
        byCell.get(cId) match {
          case None => (cId, prev) // empty cluster keeps its centroid
          case Some(rows) =>
            val nxt = prev.clone()
            rows.foreach { r =>
              nxt(r.getInt(1)) =
                (r.getLong(3).toDouble / r.getLong(2).toDouble) / CQ
            }
            (cId, nxt)
        }
      }
      converged = next.iterator.zip(cents.iterator).forall {
        case ((_, a), (_, b)) => java.util.Arrays.equals(a, b)
      }
      cents = next
    }
    (cents, lastAssigned, lastCounts)
  }

  /** Centroid-only fit over any `(vec_id, embedding)` frame — the
    * quantizer-build entry ([[Similarity]]'s PQ/OPQ codebooks and
    * coarse cells, r16): [[fitLoop]]'s centroids, dense ids 0..k-1 in
    * id order. One deterministic init collect plus ONE combinable
    * full-pass aggregation job per (non-converged) iteration — no
    * VectorUDT conversion, no k-means|| init passes, and on the
    * literal-argmin path no corpus-sized exchange at all, vs
    * ml.KMeans's ~10 jobs per fit (the r15 verdict's OPQ job-count
    * floor, ask #5). Callers' oracle rows are fit-value-independent
    * (exhaustive-probe ≡ brute force, or stash-literal replay), so
    * centroid VALUES moving off ml.KMeans's is sanctioned there;
    * recall floors stay pinned in OpqSpec/AnnRecallSpec. */
  private[queries] def fitCentroids(
      v: DataFrame, k: Int, iters: Int): Seq[(Long, Array[Double])] =
    fitLoop(v, k, iters)._1

  /** LOCKSTEP multi-subspace Lloyd fit (r16): the m per-subspace
    * codebook fits of a PQ/OPQ build are independent given the shared
    * vector frame — each subspace's update reads only its own slice —
    * so one pass can advance ALL of them: per iteration, ONE
    * combinable aggregation job computes every subspace's quantized
    * (cell, dim) sums, instead of m separate jobs (m full scans) per
    * iteration (guide §2.4 — remove redundant passes outright; also
    * m× fewer scheduler round-trips, the r15 verdict's OPQ job-count
    * floor). Centroids are BIT-IDENTICAL to m independent [[fitLoop]]
    * runs: same k-smallest-id init per slice, same packed-argmin
    * assignment, same exact-integer fixed-point sums (commutative, so
    * sharing the aggregation changes nothing), same update/empty-cell
    * carry, same exact early stop (all subspaces at a fixed point).
    * Returns codebooks in subspace order, each k × dsub with dense
    * c_ids 0..k-1 implicit in row order. */
  private[queries] def fitSubspaceCodebooks(
      v: DataFrame, m: Int, dsub: Int, k: Int, iters: Int)
      : Seq[Array[Array[Double]]] = {
    require(m >= 1 && k > 0 && iters >= 1, s"bad fit shape m=$m k=$k iters=$iters")
    // past the literal-argmin bound (ksub → 256 at scale pushes
    // k×dsub literals per subspace over the codegen budget), fall
    // back to independent per-subspace fits on the broadcast-join
    // path — same centroids, m× the passes
    if (m == 1 || k.toLong * dsub > LitAssignMaxCoeffs)
      return (0 until m).map { j =>
        fitLoop(v.select(col("vec_id"),
          slice(col("u"), j * dsub + 1, dsub).as("embedding")), k, iters)
          ._1.sortBy(_._1).map(_._2).toArray
      }
    // ONE init collect for every subspace: fitLoop's init is the k
    // smallest vec_ids of the SAME frame, so each subspace's init is
    // a slice of the same collected rows
    val initRows = v.select(col("vec_id"), col("u"))
      .orderBy(col("vec_id")).limit(k)
      .collect().sortBy(_.getLong(0))
      .map(_.getSeq[Number](1).map(_.doubleValue()).toArray)
    require(initRows.nonEmpty, "fitSubspaceCodebooks: empty input")
    var cents: Array[Array[(Long, Array[Double])]] = Array.tabulate(m) { j =>
      initRows.zipWithIndex.map { case (u, i) =>
        (i.toLong, u.slice(j * dsub, (j + 1) * dsub))
      }
    }
    var converged = false
    for (_ <- 1 to iters if !converged) {
      // one row per (subspace, cell, dim): the same posexplode volume
      // the m separate fits produced COMBINED, in one job
      val subStructs = (0 until m).map { j =>
        struct(lit(j).as("j"),
          packedMin(slice(col("u"), j * dsub + 1, dsub), cents(j).toSeq).as("cell"),
          slice(col("u"), j * dsub + 1, dsub).as("sub"))
      }
      val sums = v
        .select(explode(array(subStructs: _*)).as("s"))
        .select(col("s.j"), col("s.cell"), posexplode(col("s.sub")).as(Seq("dim", "x")))
        .select(col("j"), col("cell"), col("dim"),
          round(col("x").cast("double") * lit(CQ)).cast("long").as("q"))
        .groupBy("j", "cell", "dim")
        .agg(count(lit(1)).as("n"), sum(col("q")).as("qsum"))
        .collect()
      val byJ = sums.groupBy(_.getInt(0))
      val next = Array.tabulate(m) { j =>
        val byCell = byJ.getOrElse(j, Array.empty[org.apache.spark.sql.Row])
          .groupBy(_.getLong(1))
        cents(j).map { case (cId, prev) =>
          byCell.get(cId) match {
            case None => (cId, prev) // empty cluster keeps its centroid
            case Some(rows) =>
              val nxt = prev.clone()
              rows.foreach { r =>
                nxt(r.getInt(2)) =
                  (r.getLong(4).toDouble / r.getLong(3).toDouble) / CQ
              }
              (cId, nxt)
          }
        }
      }
      converged = (0 until m).forall { j =>
        next(j).iterator.zip(cents(j).iterator).forall {
          case ((_, a), (_, b)) => java.util.Arrays.equals(a, b)
        }
      }
      cents = next
    }
    cents.toSeq.map(_.sortBy(_._1).map(_._2))
  }

  /** The packed quantized-distance key for ONE (embedding, centroid)
    * pair — the fixed-shape IEEE d2 chain (strict left fold, the
    * oracle's exact mirror) packed as `round(d2·2^30)·2^21 + c_id`
    * with the 2^41 domain guard folded in. `cEmb` as a Column lets the
    * batch path pass the joined `c_emb` column and the frozen path
    * pass a literal array — ONE arithmetic definition, so fitted and
    * frozen assignment cannot drift ([[packedMin]]). */
  private[queries] def packedDistCol(
      emb: org.apache.spark.sql.Column,
      cEmb: org.apache.spark.sql.Column,
      cId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // native codegen kernel (r16, guide §4): bit-identical left fold
    // to the aggregate(zip_with((x−c)·(x−c)))) chain it replaces —
    // the HOF pair ran interpreted with per-element boxing, dominant
    // CPU in the literal-argmin assignment at dims = 64
    val d2 = graft.functions.NativeExpressions.l2sq(emb, cEmb)
    val domain = coalesce(
      assert_true(d2 * lit(DQ) < lit((1L << 41).toDouble),
        lit("kmeans: squared distance exceeds the 2^41 packing domain " +
          "— normalize or rescale the embeddings")).cast("long"),
      lit(0L))
    (round(d2 * lit(DQ)).cast("long") * (1L << 21)) + cId + domain
  }

  /** Stateless nearest-cell column under FROZEN centroid literals:
    * `least` over the k packed keys — the same min the batch
    * assignment's groupBy computes, as a pure per-row expression a
    * STREAMING plan can host (no join, no agg — the G22 argument). */
  private[queries] def packedMin(
      emb: org.apache.spark.sql.Column,
      cents: Seq[(Long, Array[Double])]): org.apache.spark.sql.Column = {
    require(cents.nonEmpty, "packedMin: no centroids")
    val packs = cents.map { case (cId, c) =>
      packedDistCol(emb, lit(c), lit(cId)) }
    pmod(if (packs.size == 1) packs.head else least(packs: _*),
      lit(1L << 21))
  }

  /** Centroid sets small enough to enter the plan as LITERALS (k×dims
    * expression nodes): below this, assignment is [[packedMin]] — a
    * pure per-row `least` over the k packed keys, NO join and NO
    * aggregation exchange. Past it (cells ≈ √N territory) literal
    * centroids would blow up analysis/codegen (the annIvfTrained
    * lesson) and the broadcast-join argmin is the path. */
  private val LitAssignMaxCoeffs = 4096

  private[queries] def litAssignable(cents: Seq[(Long, Array[Double])]): Boolean =
    cents.size.toLong * cents.head._2.length <= LitAssignMaxCoeffs

  /** One assignment pass: nearest centroid by the fixed-shape IEEE d2
    * chain, argmin as the packed-long `min` (quantized-distance ties to
    * the smaller c_id — the oracle's ORDER BY, verbatim). Small
    * centroid sets take the [[packedMin]] literal path — `least` over
    * the k packed keys per row, the SAME min over the SAME
    * [[packedDistCol]] values the groupBy computes, with zero exchanges
    * (guide §2.4; the frozen-path/fitted-path equality CorpusMapSpec
    * pins). Large sets keep the broadcast nested-loop whose packed
    * argmin collapses map-side. Shared by every [[fitLoop]] iteration
    * and the sample-fit full-corpus assign in [[assignments]], so the
    * two paths cannot drift. */
  private[queries] def assignStep(
      v: DataFrame, cents: Seq[(Long, Array[Double])]): DataFrame = {
    if (litAssignable(cents))
      return v.select(col("vec_id"),
        packedMin(col("embedding"), cents).as("cell"))
    val spark = v.sparkSession
    import spark.implicits._
    val centsDf = cents.toDF("c_id", "c_emb")
    val packed = packedDistCol(col("embedding"), col("c_emb"), col("c_id"))
    v.join(broadcast(centsDf), lit(true))
      .groupBy("vec_id")
      .agg(min(packed).as("p"))
      .select(col("vec_id"), pmod(col("p"), lit(1L << 21)).as("cell"))
  }

  /** The centroids the model's LAST assignment uses (cents_{iters-1} —
    * the state [[assignments]]' default path assigns under), as frozen
    * literals: the bounded model state a stateless stream-side
    * assignment carries ([[CorpusMap.assignFrozen]], G22). Fits on the
    * seeded draw when `fitFraction` < 1. */
  private[graft] def assignCentroids(
      embeddings: DataFrame,
      k: Int = 8,
      iters: Int = 3,
      fitFraction: Double = 1.0): Seq[(Long, Array[Double])] = {
    require(k > 0 && k < (1 << 21) - 1, s"k must be in [1, 2^21), got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val v = embeddings.select(col("vec_id"), col("embedding"))
    val s = Similarity.fitFrame(v, fitFraction, 0L, k, "kmeansCentroids")
    val cents = fitLoop(s, k, iters - 1)._1
    Similarity.releaseFitFrame(s, fitFraction)
    cents
  }

  /** The fit replayed in SQL: chained CTEs per iteration — assignment
    * (quantized-argmin ORDER BY, the packed-min's exact mirror),
    * fixed-point sums, centroid update with empty-cluster carry —
    * ending in the long-format model. MATERIALIZED (the D24 lesson:
    * default inlining re-expands the chain exponentially). */
  private def sqlKmeans(k: Int, iters: Int): String =
    s"""WITH v AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
      ${sqlKmeansCtes(k, iters)},
      counts AS (SELECT cell, count(*) AS n_vecs FROM asg$iters GROUP BY 1)
      SELECT c.c_id, CAST(d.i - 1 AS BIGINT) AS dim,
        CAST(coalesce(n.n_vecs, 0) AS BIGINT) AS n_vecs,
        c.c_emb[d.i] AS centroid
      FROM cents$iters c
      CROSS JOIN (SELECT unnest(range(1, (SELECT len(c_emb) FROM cents$iters LIMIT 1) + 1)) AS i) d
      LEFT JOIN counts n ON c.c_id = n.cell
      ORDER BY c_id, dim"""

  /** The fit replayed as CTE fragments over an upstream CTE
    * `v (vec_id, embedding)` — cents0..cents$iters and asg1..asg$iters
    * (asg$iters = the final assignment [[assignments]] returns).
    * Shared by the E14 row and the I12 corpus-map composition (the
    * D17 technique: one fragment, consumers cannot drift). */
  private[queries] def sqlKmeansCtes(k: Int, iters: Int): String = {
    val d2 = """list_reduce(list_prepend(0.0::DOUBLE,
        list_transform(range(1, len(v.embedding) + 1),
          i -> (v.embedding[i]::DOUBLE - c.c_emb[i])
             * (v.embedding[i]::DOUBLE - c.c_emb[i]))),
        (acc, x) -> acc + x)"""
    val its = (1 to iters).map { t =>
      s"""asg$t AS MATERIALIZED (SELECT vec_id, c_id AS cell FROM (
          SELECT v.vec_id, c.c_id,
            row_number() OVER (PARTITION BY v.vec_id ORDER BY
              round($d2 * 1073741824.0::DOUBLE) ASC, c.c_id ASC) AS rn
          FROM v CROSS JOIN cents${t - 1} c) z WHERE rn = 1),
        sums$t AS MATERIALIZED (
          SELECT cell, dim, count(*) AS n, CAST(sum(q) AS BIGINT) AS qsum
          FROM (
            SELECT a.cell,
              CAST(generate_subscripts(v.embedding, 1) - 1 AS BIGINT) AS dim,
              CAST(round(unnest(v.embedding)::DOUBLE * 4096.0::DOUBLE)
                AS BIGINT) AS q
            FROM v JOIN asg$t a ON v.vec_id = a.vec_id) z
          GROUP BY 1, 2),
        cents$t AS MATERIALIZED (
          SELECT p.c_id,
            list_transform(range(1, len(p.c_emb) + 1),
              i -> coalesce(m.by_dim[i], p.c_emb[i])) AS c_emb
          FROM cents${t - 1} p LEFT JOIN (
            SELECT cell,
              list((CAST(qsum AS DOUBLE) / CAST(n AS DOUBLE)) / 4096.0::DOUBLE
                ORDER BY dim) AS by_dim
            FROM sums$t GROUP BY cell) m ON p.c_id = m.cell)"""
    }.mkString(",\n      ")
    s"""cents0 AS MATERIALIZED (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c_id,
          list_transform(embedding, x -> x::DOUBLE) AS c_emb
        FROM (SELECT vec_id, embedding FROM v ORDER BY vec_id LIMIT $k) s),
      $its"""
  }

  val qKmeans: Q = Q(
    "q_kmeans",
    (s, d) => kmeans(Tables.embeddings(s, d), k = 8, iters = 3),
    Some(sqlKmeans(8, 3)))

  val all: Seq[Q] = Seq(qKmeans)
}
