package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed "clean my crawl" pipeline a
  * training-data user actually runs, chaining the individually
  * oracle-checked stages: quality gate → exact dedup → near-dup drop.
  * One lazy plan; each stage's scale shape is documented on its own
  * operator (quality is a map stage, both dedups shuffle 8-byte hashes,
  * never text).
  */
object Curation {

  /** Clean `docs` (doc_id, text, …): keep docs with
    * `quality_score >= minQuality`, then drop exact duplicates (min
    * doc_id survives), then — when `dropNearDups` — drop the larger id
    * of every MinHash near-dup pair (greedy keep-smallest; applied to
    * the already-exact-deduped corpus, so chains collapse toward their
    * smallest member pairwise, without a connected-components pass).
    * Returns the surviving rows of `docs` plus their `quality_score`.
    *
    * Plan shape: quality gate + exact dedup are ONE chain (the
    * full-schema [[Dedup.exactSurvivors]] window — no join back that
    * would re-evaluate the scoring subtree); the near-dup stage then
    * references that chain twice (anti-join left side + pair
    * generation), which lazy plans re-evaluate — persist `docs` (the
    * scan dominates) or the returned frame when running at corpus
    * scale. */
  def curate(
      docs: DataFrame,
      minQuality: Double = 0.3,
      dropNearDups: Boolean = true): DataFrame = {
    val quality = TextAnalysis.qualityScores(docs)
      .select(col("doc_id"), col("quality_score"))
    val afterExact = Dedup.exactSurvivors(
      docs.join(quality, "doc_id")
        .filter(col("quality_score") >= minQuality))
    if (!dropNearDups) afterExact
    else {
      val nearDrop = Dedup.minhashPairs(afterExact)
        .select(col("id_b").as("doc_id")).distinct()
      afterExact.join(nearDrop, Seq("doc_id"), "left_anti")
    }
  }
}
