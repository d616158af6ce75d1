package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** End-to-end composition: the "switch from the reference" pipeline —
  * ingest a text corpus, score quality, drop exact dups, write
  * partitioned parquet, read it back pruned. Each stage is covered
  * individually elsewhere; this pins that they COMPOSE. */
class PipelineSpec extends SparkSpec {

  test("corpus -> quality -> dedup -> partitioned parquet round trip") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .unionByName( // plant one exact dup of doc 0
        Tables.documents(spark, sfDir).filter($"doc_id" === 0)
          .withColumn("doc_id", lit(999999L)))

    val quality = Graft.qualityScores(docs)
      .select($"doc_id", $"quality_score")
    val keep = Graft.exactDuplicates(docs).filter(!$"is_dup")
      .join(quality, "doc_id")
      .join(docs.select($"doc_id", $"text", $"source"), "doc_id")

    val out = Files.createTempDirectory("pipe").toString
    Graft.sinks.parquet(keep, s"$out/clean", partitionBy = Seq("source"))

    val back = spark.read.parquet(s"$out/clean")
    assert(back.count() == docs.count() - 1) // exactly the dup dropped
    assert(back.filter($"doc_id" === 999999L).count() == 0)
    // partition pruning works on the sink layout
    val pruned = back.filter($"source" === "src1")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(source"))
    assert(pruned.count() == docs.filter($"source" === "src1" && $"doc_id" =!= 999999L).count())
  }

  test("curateClusters keeps one survivor per near-dup cluster, never more than curate") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val greedy = Graft.curate(docs).select("doc_id")
    val cluster = Graft.curateClusters(docs).select("doc_id")
    // greedy drops any pair's larger id; the cluster form drops every
    // non-min member — a strict superset of the greedy drops
    assert(cluster.exceptAll(greedy).count() == 0)
    // survivors == distinct components over the exact-dedup survivors
    val afterExact = Graft.curate(docs, dropNearDups = false)
    val pairs = Graft.minhashPairs(afterExact).select($"id_a", $"id_b")
    val labels = Graft.connectedComponents(pairs, "id_a", "id_b")
    val multi = labels.select($"component").distinct().count()
    val paired = labels.count()
    assert(cluster.count() == afterExact.count() - (paired - multi))
  }
}
