package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory behind `queries`/`oracleSql`.
  */
object SparkEntry {

  /** Every implemented operator, one Q each (SURVEY.md §2). */
  def allQueries: Seq[Q] =
    Analytics.all ++ TextQueries.all ++ MrQueries.all ++ TextAnalysis.all ++
      Dedup.all ++ Similarity.all ++ Multimodal.all ++ Sessions.all ++
      ScaleQueries.all ++ ShardReplay.all ++ Curation.all ++ Clusters.all ++
      Scrub.all ++ SemiStructured.all ++ Ranking.all ++ Shards.all ++
      Contamination.all ++ Blocks.all ++ QualityModel.all ++ GraphRank.all ++
      SnapshotDiff.all ++ Quantize.all ++ Attribution.all ++ Profile.all ++
      Selection.all ++ LineFilters.all ++ DupCensus.all ++ TokenizerStats.all ++
      DocEmbed.all ++ SuffixDedup.all ++ Splits.all ++ QualityTrain.all ++
      Funnels.all ++ Integrity.all ++ FuzzyJoin.all ++ BigramLm.all ++
      LinAlg.all ++ Series.all ++ KMeansLloyd.all ++ TextRank.all ++
      Extract.all ++ Sketches.all ++ UrlFilter.all ++ Unigram.all ++
      CorpusMap.all ++ SpanIncremental.all ++ ByteTokenizer.all ++
      CrawlRecords.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q5RegionRevenue.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** Equivalent ANSI SQL runnable by DuckDB on the same parquet tables;
    * omitted for non-SQL-expressible ops (driver then row-count checks). */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
