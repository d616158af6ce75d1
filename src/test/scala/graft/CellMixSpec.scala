package graft

import graft.queries.{CellMix, CorpusMap}
import org.apache.spark.sql.functions._

/** H15 [[CellMix.cellMix]]: before-mass equals the I12 census (the
  * shared docCells frame cannot drift), rates replay the uniform-
  * target formula exactly, achieved token mass tracks rate·mass,
  * custom targets drive excision and clamping, and the sample-fit
  * path still places every doc. */
class CellMixSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)

  private lazy val mixed = CellMix.cellMix(docs)
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  test("before-mass per (cell, decile) equals the I12 census") {
    val fromMix = mixed.groupBy("cell", "decile")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val census = CorpusMap.corpusMap(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(fromMix == census,
      "the mixer's denominator frame must BE the census (D17 discipline)")
  }

  test("uniform-target rates replay min(1, (t/k)/g) exactly; achieved mass tracks rate") {
    val rows = mixed.groupBy("cell", "decile")
      .agg(sum(col("n_tokens")).as("g"),
        min(col("rate")).as("rate_lo"), max(col("rate")).as("rate_hi"),
        count(lit(1)).as("n"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("tok_after"))
      .collect()
    val k = rows.length.toDouble
    val t = rows.map(_.getLong(2)).sum.toDouble
    rows.foreach { r =>
      val g = r.getLong(2).toDouble
      val expected = math.min(1.0, (t * (1.0 / k)) / g)
      assert(r.getDouble(3) == expected && r.getDouble(4) == expected,
        s"rate drifted from the uniform-target formula at ${(r.getLong(0), r.getLong(1))}: " +
          s"got [${r.getDouble(3)}, ${r.getDouble(4)}], expected $expected")
      // the seeded LCG draw is unbiased: achieved kept-token mass sits
      // near rate·g (deterministic value — no flake; the bound is loose
      // only because groups at this SF hold few docs)
      if (r.getDouble(3) < 1.0 && r.getLong(5) >= 30)
        assert(math.abs(r.getLong(6) - expected * g) / g <= 0.30,
          s"achieved token share strayed from target at ${(r.getLong(0), r.getLong(1))}: " +
            s"kept ${r.getLong(6)} of $g at rate $expected")
    }
    // groups at or under the uniform budget keep everything
    val fullRate = mixed.filter(col("rate") >= 1.0)
    assert(fullRate.filter(!col("keep")).count() == 0,
      "rate-1.0 groups must keep every doc")
  }

  test("custom targets: absent groups excised, share-1 group kept whole, fractional share exact") {
    import spark.implicits._
    val groups = mixed.select("cell", "decile").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keeper = groups.minBy(identity)
    val only = Seq((keeper._1, keeper._2, 1.0)).toDF("cell", "decile", "share")
    val excised = CellMix.cellMix(docs, targets = Some(only))
    assert(excised.filter(col("keep") &&
        !(col("cell") === keeper._1 && col("decile") === keeper._2)).count() == 0,
      "groups absent from targets must be dropped entirely")
    // share 1.0 of the total budget >= the group's own mass -> rate
    // clamps at 1.0 and the group survives whole
    assert(excised.filter(col("cell") === keeper._1 &&
        col("decile") === keeper._2 && !col("keep")).count() == 0,
      "a group granted the whole budget must keep every doc")
    // a fractional share prices the rate at exactly share*t/g
    val t = mixed.agg(sum(col("n_tokens"))).head().getLong(0).toDouble
    val g = mixed.filter(col("cell") === keeper._1 &&
        col("decile") === keeper._2)
      .agg(sum(col("n_tokens"))).head().getLong(0).toDouble
    val share = 0.5 * g / t // guarantees rate = share*t/g = 0.5 < 1
    val frac = Seq((keeper._1, keeper._2, share)).toDF("cell", "decile", "share")
    val rated = CellMix.cellMix(docs, targets = Some(frac))
      .filter(col("cell") === keeper._1 && col("decile") === keeper._2)
      .select("rate").distinct().collect()
    assert(rated.length == 1 && rated.head.getDouble(0) == (t * share) / g,
      s"fractional-share rate drifted: ${rated.toSeq}")
  }

  test("sample-fit path (fitFraction 0.5) still places and rates every doc") {
    val sampled = CellMix.cellMix(docs, fitFraction = 0.5)
    assert(sampled.count() == docs.count(),
      "every doc must be placed on the grid under a sample fit")
    assert(sampled.filter(col("rate") <= 0.0 || col("rate") > 1.0).count() == 0,
      "rates must stay in (0, 1]")
  }

  test("G23 frozen twin: mixFrozen under a same-corpus fit == cellMix BIT-EXACTLY") {
    val model = CorpusMap.fitModel(docs)
    val rates = CellMix.fitRates(docs)
    val frozen = CellMix.mixFrozen(docs, model, rates)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    val batch = mixed
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(frozen == batch,
      "the fully-frozen mixer must replay the fitted mixer bit for bit")
    // the rate table is bounded model state: <= cells x 10 rows
    assert(rates.size <= CorpusMap.MapCells * 10,
      s"rate table must stay grid-bounded, got ${rates.size} rows")
    // a group absent from the rates table is excised (rate 0), the
    // cellMix designed-targets contract carried to the frozen path
    val dropAll = CellMix.mixFrozen(docs, model, Seq.empty)
    assert(dropAll.filter(col("keep")).count() == 0L &&
      dropAll.count() == docs.count(),
      "an empty rate table must place every doc and keep none")
  }
}
