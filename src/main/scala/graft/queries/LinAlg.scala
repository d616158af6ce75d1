package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear algebra over the embeddings table (SURVEY.md §2
  * E12–E13) — the whitening/PCA preparation steps an embedding
  * pipeline runs between ingest (E9) and indexing (E3/E7): the exact
  * Gram matrix X^T X and the first principal-component projection.
  *
  * Both rows follow the house determinism patterns: components are
  * quantized to 1/4096 fixed point (the E5 technique — float→double
  * exact, ×2^12 an exponent shift, round-half-away equal across
  * engines), every aggregate is an exact integer sum (commutative,
  * partition-order free), and the PCA fit is driver-side model state
  * whose vector enters the oracle as literals (the D15c stash
  * technique).
  */
object LinAlg {

  private[this] val cache = new graft.ops.PlanCache(capacity = 2)

  /** Fixed-point scale shared with E5. */
  private val Q12 = 4096.0

  /** Exact BIGINT→DOUBLE conversion that stays correct past 2^53 on
    * both engines: split on |x| (floor==trunc for non-negatives), each
    * part casts exactly, the recombination sees identical operands.
    * (A direct cast double-rounds differently on DuckDB's wide ints —
    * the I4 lesson.) */
  private def splitToDouble(c: Column): Column = {
    val a = abs(c)
    val hi = shiftright(a, 26)              // == a div 2^26 for a >= 0
    val lo = a.bitwiseAND(lit((1L << 26) - 1)) // == a mod 2^26 for a >= 0
    signum(c.cast("double")) *
      (hi.cast("double") * lit((1L << 26).toDouble) + lo.cast("double"))
  }

  private def sqlSplitToDouble(x: String): String =
    s"""(CASE WHEN $x < 0 THEN -1.0::DOUBLE ELSE 1.0::DOUBLE END *
      (CAST(abs($x) // 67108864 AS DOUBLE) * 67108864.0::DOUBLE
        + CAST(abs($x) % 67108864 AS DOUBLE)))"""

  /** E12: exact Gram matrix G = Σ_vecs q q^T of the 1/4096-quantized
    * embeddings — dims² cells from one pass. Output long format:
    * (i, j, n_vecs, qsum BIGINT exact, gram DOUBLE = qsum/2^24, the
    * dot-product mass in original units).
    *
    * Scale shape: each vector emits its dims² quantized products from
    * ONE codegen'd nested-lambda explode (no self-join — the corpus is
    * never keyed or shuffled by vec_id), aggregated map-side onto the
    * dims² key space, tiny forever. Exactness bound: |qsum| ≤
    * n·(4096·max|v|)² — inside BIGINT to ~5·10¹¹ vectors at |v| ≤ 1
    * (document and widen to DECIMAL(38) sums past that). */
  def gramMatrix(embeddings: DataFrame): DataFrame = {
    // quantize ONCE per row, then two chained codegen'd posexplodes:
    // N·d intermediate rows carrying the small long array, N·d² flat
    // term rows into the partial agg — no struct-array construction
    // per row (the nested-lambda named_struct form cost 12.9 s at
    // sf0.1: generator pushdown re-evaluated the 4096-struct array
    // and the Generate path churned objects; this shape is ~20×)
    val q = embeddings.select(expr(
      "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 4096.0) AS BIGINT))")
      .as("qa"))
    val e1 = q.select(col("qa"), posexplode(col("qa")).as(Seq("i", "qi")))
    val terms = e1.select(col("i"), col("qi"),
      posexplode(col("qa")).as(Seq("j", "qj")))
    // memo: the dims²-row result is read by q_gram_matrix AND as
    // pcaProject's fit input in the same session — the N·d² pass
    // should run once
    cache.memo(terms
      .groupBy(col("i").cast("long").as("i"), col("j").cast("long").as("j"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("qi") * col("qj")).as("qsum"))
      .select(col("i"), col("j"), col("n_vecs"), col("qsum"),
        (splitToDouble(col("qsum")) / lit((1L << 24).toDouble)).as("gram")))
      .orderBy("i", "j")
  }

  private val sqlGram: String = s"""WITH ex AS (
        SELECT vec_id,
          CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
          CAST(round(CAST(unnest(embedding) AS DOUBLE) * 4096.0::DOUBLE) AS BIGINT) AS q
        FROM embeddings),
      g AS (
        SELECT a.dim AS i, b.dim AS j, count(*) AS n_vecs,
          CAST(sum(a.q * b.q) AS BIGINT) AS qsum
        FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2)
      SELECT i, j, n_vecs, qsum,
        ${sqlSplitToDouble("qsum")} / 16777216.0::DOUBLE AS gram
      FROM g ORDER BY i, j"""

  val qGramMatrix: Q = Q(
    "q_gram_matrix",
    (s, d) => gramMatrix(Tables.embeddings(s, d)),
    Some(sqlGram))

  /** PC1 stash for [[qPcaProject]]'s oracle (the D15c pattern: Verify
    * dumps oracle SQL after running the queries, so a def-valued Q can
    * embed the exact fitted vector as literals). */
  private val lastPc1 =
    new java.util.concurrent.atomic.AtomicReference[Array[Double]]()

  /** Driver-side power iteration on the collected Gram matrix (dims²
    * longs — metadata-scale by construction, the C13 bounded-collect
    * contract). Deterministic: v₀ = e₀, T fixed iterations, plain
    * double arithmetic. */
  private[graft] def powerIterate(
      g: Array[Array[Double]], iters: Int = 30): Array[Double] = {
    val d = g.length
    var v = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    var t = 0
    while (t < iters) {
      val w = Array.tabulate(d)(i => {
        var s = 0.0; var j = 0
        while (j < d) { s += g(i)(j) * v(j); j += 1 }; s
      })
      val n = math.sqrt(w.map(x => x * x).sum)
      require(n > 0, "power iteration degenerated: zero Gram product")
      v = w.map(_ / n)
      t += 1
    }
    v
  }

  /** E13: first-principal-component projection — fit PC1 by power
    * iteration on E12's EXACT quantized Gram (driver-side model state,
    * like every fit in this engine), then project the corpus in one
    * shuffle-free map: pc1 = Σ_d v_d·emb_d as a fixed-order unrolled
    * chain (bit-identical cross-engine; the fitted v enters the oracle
    * as '…'::DOUBLE literals). The embedding pipeline's dim-reduction/
    * whitening step with the fit's plumbing oracle-checked end to end
    * (E3b's argument, strengthened by literal injection like D15c).
    * Sign of v is fixed by the deterministic iteration (v₀ = e₀). */
  def pcaProject(embeddings: DataFrame, iters: Int = 30): DataFrame = {
    val gramRows = gramMatrix(embeddings)
      .select("i", "j", "gram").collect()
    require(gramRows.nonEmpty, "empty embeddings frame")
    val d = gramRows.map(_.getLong(0)).max.toInt + 1
    val g = Array.ofDim[Double](d, d)
    gramRows.foreach(r => g(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getDouble(2))
    val v = powerIterate(g, iters)
    lastPc1.set(v)
    val proj = v.zipWithIndex
      .map { case (w, i) =>
        lit(w) * element_at(col("embedding"), i + 1).cast("double")
      }
      .reduce(_ + _) // left fold: ((w0·e0 + w1·e1) + …) — fixed shape
    embeddings.select(col("vec_id"), proj.as("pc1")).orderBy("vec_id")
  }

  // a DEF (D15c): the oracle must embed the vector fitted by THIS run
  def qPcaProject: Q = Q(
    "q_pca_project",
    (s, d) => pcaProject(Tables.embeddings(s, d)),
    Some {
      Option(lastPc1.get()) match {
        case None => "SELECT CAST(NULL AS BIGINT) AS vec_id WHERE FALSE"
        case Some(v) =>
          val chain = v.zipWithIndex
            .map { case (w, i) =>
              s"('$w'::DOUBLE * CAST(embedding[${i + 1}] AS DOUBLE))"
            }
            .reduce((a, b) => s"($a + $b)")
          s"""SELECT vec_id, $chain AS pc1
            FROM embeddings ORDER BY vec_id"""
      }
    })

  def all: Seq[Q] = Seq(qGramMatrix, qPcaProject)
}
