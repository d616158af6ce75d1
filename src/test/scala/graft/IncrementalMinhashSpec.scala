package graft

/** D13b [[graft.queries.Dedup.dedupIncrementalMinhash]]: planted
  * near-dup flags, lake-never-self-pairs scoping, equality with the
  * oracle semantics (full D2 pair set filtered by partner role), and
  * partitioning invariance. */
class IncrementalMinhashSpec extends SparkSpec {
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog while rain falls on the quiet village roofs tonight"
  private val textB = "completely different subject matter describing harbor cranes lifting steel containers onto waiting cargo vessels"
  private val textC = "a third body of text about mountain trails winding through pine forests under late summer skies"
  private val textD = "unique final document mentioning neither foxes nor cranes nor trails just spreadsheets and quarterly reports"

  private def run(inc: org.apache.spark.sql.DataFrame, kn: org.apache.spark.sql.DataFrame) =
    Graft.dedupIncrementalMinhash(inc, kn).collect().toSeq.map(r =>
      (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getLong(3)))

  test("near-known, near-in-batch, and clean docs flag exactly as planted") {
    val known = Seq((0L, textA), (3L, textB), (6L, textB)).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, textA + " epilogue"), // near-dup of lake doc 0
      (2L, textC),               // first in batch: clean
      (4L, textC),               // near-dup of EARLIER batch doc 2
      (5L, textD))               // unique
      .toDF("doc_id", "text")
    val out = run(incoming, known)
    assert(out == Seq(
      (1L, true, false, 0L),
      (2L, false, false, 1L),
      (4L, false, true, 0L),
      (5L, false, false, 1L)), out)
  }

  test("lake-internal duplicates never surface; output covers incoming only") {
    val known = Seq((0L, textB), (3L, textB), (6L, textB)).toDF("doc_id", "text")
    val incoming = Seq((1L, textC), (2L, textD)).toDF("doc_id", "text")
    val out = run(incoming, known)
    assert(out == Seq((1L, false, false, 1L), (2L, false, false, 1L)), out)
  }

  test("flags equal the full D2 pair set filtered by partner role") {
    // the oracle's formulation: compute EVERY near-dup pair over the
    // union, then derive per-incoming flags from partner ids — the
    // restricted candidate join must lose nothing
    val docs = (0L until 36L).map { i =>
      // digit suffixes tokenize away (letter-run tokenizer), so unique
      // docs need unique LETTER runs
      val u = "z" * (i.toInt + 1)
      val t = (i % 4) match {
        case 0 => textA
        case 1 => textB + s" tail"
        case 2 => textC
        case _ => ('a' to 'j').map(c => s"$u$c").mkString(" ") // fully disjoint shingles
      }
      (i, t)
    }
    val all = docs.toDF("doc_id", "text")
    val known = all.filter($"doc_id" % 3 === 0)
    val incoming = all.filter($"doc_id" % 3 =!= 0)
    val pairs = Graft.minhashPairs(all).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    val ori = pairs ++ pairs.map(p => (p._2, p._1))
    val expected = docs.map(_._1).filter(_ % 3 != 0).sorted.map { id =>
      val partners = ori.filter(_._1 == id).map(_._2)
      val nk = partners.exists(_ % 3 == 0)
      val nb = partners.exists(p => p % 3 != 0 && p < id)
      (id, nk, nb, if (!nk && !nb) 1L else 0L)
    }
    val out = run(incoming, known)
    assert(out == expected, s"$out vs $expected")
    assert(expected.exists(_._2) && expected.exists(_._3) && expected.exists(_._4 == 1L))
  }

  test("overlapping incoming/known doc_ids fail the disjointness guard") {
    // re-crawl ingest plausibly reuses ids; an overlap would silently
    // multiply the band join across mismatched (doc_id, text) pairs,
    // so the contract is enforced in-plan (assert_true folded into keep)
    val known = Seq((0L, textA), (2L, textB)).toDF("doc_id", "text")
    val incoming = Seq((1L, textC), (2L, textD)).toDF("doc_id", "text")
    val e = intercept[Exception] { run(incoming, known) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("must be disjoint")), e)
  }

  test("the disjointness guard also fires for a flags-only consumer") {
    // the guard used to fold only into `keep`: a caller selecting just
    // the flags let column pruning drop the assert with the flags
    // still corrupted — it now rides every flag column too
    val known = Seq((0L, textA), (2L, textB)).toDF("doc_id", "text")
    val incoming = Seq((1L, textC), (2L, textD)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      graft.queries.Dedup.dedupIncrementalMinhash(incoming, known)
        .select("doc_id", "is_near_known").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("must be disjoint")), e)
  }

  test("is partitioning-invariant") {
    val docs = (0L until 24L).map(i =>
      (i, if (i % 5 == 0) textA else s"own${i} words${i} for${i} doc${i} number${i} with no overlap anywhere else at all"))
      .toDF("doc_id", "text")
    val known = docs.filter($"doc_id" % 3 === 0)
    val inc = docs.filter($"doc_id" % 3 =!= 0)
    val a = run(inc.repartition(1), known.repartition(1))
    val b = run(inc.repartition(7), known.repartition(3))
    assert(a == b && a.nonEmpty)
    graft.ops.Release.sweep(spark)
  }
}
