package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the adaptive alternative to
  * [[graft.ops.ScaleOps.saltedJoin]] that SURVEY.md §3 leans on for
  * runtime skew: demonstrate (with thresholds scaled to local data)
  * that Spark actually detects and splits a skewed partition, rather
  * than citing the mechanism on faith. */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the skew thresholds down to exercise the mechanism on
      // local-test volumes (defaults target multi-GB partitions)
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 200k rows, 99% on one key -> one hot shuffle partition
      val big = spark.range(200000).select(
        when(col("id") % 100 === 0, col("id") % 7).otherwise(lit(42L)).as("k"),
        concat(lit("payload-"), col("id")).as("v"))
      val small = spark.range(50).select(col("id").as("k"), lit("dim").as("d"))
      val joined = big.join(small, "k")
      assert(joined.count() == 200000) // every big row matches one dim row
      // execute THIS QueryExecution (count() plans its own adaptive
      // tree), then read the finalized plan off the same instance
      val qe = joined.queryExecution
      qe.toRdd.count()
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
