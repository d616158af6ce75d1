package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: forces EVERY output column to be computed — count()
    // would let Catalyst prune unreferenced expensive expressions
    // (hashes, scores) and under-measure compute-bound queries.
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    // Warm-up pass at the smallest SF: JIT + codegen-cache + parquet
    // footer costs land here, not on whichever query happens to run first.
    // Sweep after each so leftover checkpoint/persist blocks from one
    // query can't pressure the next (the r4 lesson: 7 unchanged queries
    // regressed >2x purely from cross-query block accumulation).
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn, "/root/testdata/sf0.001")
      catch { case _: Throwable => () }
      graft.ops.Release.sweep(spark)
    }
    // min of two timed passes per query: local container contention adds
    // multi-second noise; the min is the honest steady-state cost.
    // A failing query reports -1.0 (never its time-to-exception) so a
    // breakage can't masquerade as a speedup in the bench JSON.
    def timed(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { run(fn, sfDir); (System.nanoTime() - t0) / 1e9 }
      catch {
        case e: Throwable =>
          System.err.println(s"bench query failed: ${e.getClass.getName}: ${e.getMessage}")
          -1.0
      }
    }
    // Per-query isolation: both timed passes run back-to-back (so a
    // query's own PlanCache reuse is measured, as a real repeat caller
    // would see), then EVERYTHING it pinned is released before the next
    // query. storage_mb_held records what each query left behind pre-
    // sweep — a leak shows up as a nonzero row, self-diagnosing.
    val held = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val (a, b) = (timed(fn), timed(fn))
      val (_, mem, disk) = graft.ops.Release.held(spark)
      held(name) = (mem + disk) / (1024 * 1024)
      graft.ops.Release.sweep(spark)
      val best = if (a < 0 || b < 0) -1.0 else math.min(a, b)
      // Short per-query progress line: survives truncated log captures
      // that would lose the front of one huge final JSON line.
      println(f"bench $name%-28s ${best}%8.3f s")
      name -> best
    }
    val failed = results.collect { case (k, v) if v < 0 => k }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val heldJson = held.collect { case (k, v) if v > 0 => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"storage_mb_held":$heldJson,"sf":"$sfDir"}"""
    // The file is the durable artifact: stdout captures have twice lost
    // timings to tail-truncation of the single long JSON line.
    try {
      // cwd-relative: lands at the repo root under sbt, and works from
      // any checkout (a hardcoded absolute path silently wrote the
      // durable artifact elsewhere on other clones)
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_out.json"),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable => System.err.println(s"bench_out.json write failed: $e") }
    println(json)
    spark.stop()
  }
}
