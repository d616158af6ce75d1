package graft

import graft.queries.CorpusMap
import org.apache.spark.sql.functions._

/** I12 [[CorpusMap.corpusMap]] — census conservation, domain bounds,
  * unit-vector normalization, determinism, and non-degeneracy. */
class CorpusMapSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val map = CorpusMap.corpusMap(docs).cache()

  test("census conserves docs and tokens exactly") {
    val agg = map.agg(sum("n_docs"), sum("n_tokens")).head()
    assert(agg.getLong(0) == docs.count())
    val totalToks = docs.select(
      sum(size(graft.functions.TextFunctions.words(col("text"))).cast("long")))
      .head().getLong(0)
    assert(agg.getLong(1) == totalToks)
  }

  test("cells and deciles stay in their domains; the map is non-degenerate") {
    val rows = map.collect()
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < CorpusMap.MapCells))
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 10))
    assert(rows.map(_.getLong(0)).distinct.length > 1, "all docs in one cell")
    assert(rows.map(_.getLong(1)).distinct.length > 1, "all docs in one decile")
  }

  test("doc vectors are unit (or zero for wordless docs)") {
    val norms = CorpusMap.unitDocVectors(docs, CorpusMap.MapDims)
      .select(aggregate(col("embedding"), lit(0.0), (a, x) => a + x * x).as("n2"))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => n == 0.0 || math.abs(n - 1.0) < 1e-9))
  }

  test("identical texts share a cell; the census is repartition-invariant") {
    val tiny = Seq(
      (1L, "scan scan scan the window"),
      (2L, "scan scan scan the window"),
      (3L, "merge join group query value key line part")).toDF("doc_id", "text")
    val asg = graft.queries.KMeansLloyd.assignments(
      CorpusMap.unitDocVectors(tiny, CorpusMap.MapDims), k = 2, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg(1L) == asg(2L))
    val a = map.orderBy("cell", "decile").collect().toSeq
    val b = CorpusMap.corpusMap(docs.repartition(13))
      .orderBy("cell", "decile").collect().toSeq
    assert(a == b)
  }

  test("G22: frozen-model assignment equals the fitted census's per-doc frame exactly") {
    val model = CorpusMap.fitModel(docs)
    assert(model.centroids.size == CorpusMap.MapCells &&
      model.cuts.length == 9 && model.dims == CorpusMap.MapDims)
    val frozen = CorpusMap.assignFrozen(docs, model)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // the JOINED construction explicitly: docCells now runs the frozen
    // map at full fit, so the non-tautological differential is against
    // docCellsJoined (assignment frame ⨝ deciles ⨝ tokens)
    val fitted = CorpusMap.docCellsJoined(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(frozen == fitted,
      "stateless frozen assignment drifted from the fitted path")
    // and the frozen path is partitioning-invariant (a pure row map)
    val frozen2 = CorpusMap.assignFrozen(docs.repartition(13), model)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(frozen2 == fitted)
  }
}
