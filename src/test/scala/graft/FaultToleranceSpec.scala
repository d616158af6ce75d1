package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.TaskContext

/** The reference's scheduler probes re-expressed as Spark guarantees
  * (/root/reference/src/mrapps/crash.go, nocrash.go, jobcount.go: inject
  * worker crashes / count task invocations and require the job's OUTPUT
  * to be unaffected). In Spark those guarantees come from lineage
  * re-execution and the task-commit protocol; these specs demonstrate
  * them on this engine rather than trusting the docs.
  *
  * Invocation counting uses a JVM-static counter — valid because tests
  * run local[*] (driver and executors share one JVM); accumulators
  * wouldn't work here since updates from FAILED attempts are discarded,
  * which is itself part of the exactly-once story.
  */
object CrashCounters {
  val invocations = new AtomicLong(0)
  val rowsSeen = new AtomicLong(0)
  def reset(): Unit = { invocations.set(0); rowsSeen.set(0) }
}

class FaultToleranceSpec extends SparkSpec {

  test("crash.go: a task that dies on first attempt re-executes; result exact") {
    CrashCounters.reset()
    val sc = spark.sparkContext
    val data = sc.parallelize(1 to 10000, 8)
    val summed = data.mapPartitions { it =>
      CrashCounters.invocations.incrementAndGet()
      val tc = TaskContext.get()
      // partition 3 crashes on its first attempt — the scheduler must
      // re-issue it (the reference's 10 s re-dispatch), without
      // corrupting or double-counting output
      if (tc.partitionId() == 3 && tc.attemptNumber() == 0)
        throw new RuntimeException("injected crash (crash.go)")
      it
    }.sum()
    assert(summed == (1 to 10000).sum.toDouble)
    assert(CrashCounters.invocations.get() == 9,
      s"8 partitions + 1 retry expected, saw ${CrashCounters.invocations.get()}")
  }

  test("jobcount.go: rows from the failed attempt never leak into the aggregate") {
    CrashCounters.reset()
    import spark.implicits._
    val df = spark.range(0, 1000, 1, 4).map { i =>
      CrashCounters.rowsSeen.incrementAndGet()
      val tc = TaskContext.get()
      if (tc.partitionId() == 1 && tc.attemptNumber() == 0 && i == 400)
        throw new RuntimeException("injected crash mid-partition")
      i
    }
    val out = df.groupBy(($"value" % 10).as("k")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSeq == Seq.fill(10)(100L))
    assert(CrashCounters.rowsSeen.get() > 1000,
      "the failed attempt did real work; the aggregate must not see it")
  }

  test("mtiming.go: independent partitions execute concurrently") {
    val sc = spark.sparkContext
    val t0 = System.nanoTime()
    // 4 partitions x 500 ms sleep; serial execution would be >= 2 s
    sc.parallelize(1 to 4, 4).foreach(_ => Thread.sleep(500))
    val wall = (System.nanoTime() - t0) / 1e9
    assert(wall < 1.8, s"partitions ran serially: $wall s")
  }

  test("rtiming.go: reduce-stage tasks execute concurrently after the shuffle") {
    import org.apache.spark.sql.functions.col
    // hash-shuffle into exactly 4 reduce partitions, then 500 ms of
    // "reduce work" per partition: a serial reduce stage would be >= 2 s;
    // the reference's rtiming.go asserts the reducers overlap in time
    val shuffled = spark.range(0, 800, 1, 8)
      .select((col("id") % 97).as("k"), col("id"))
      .repartition(4, col("k"))
    val t0 = System.nanoTime()
    val n = shuffled.rdd.mapPartitions { it =>
      Thread.sleep(500)
      Iterator.single(it.length)
    }.collect().sum
    val wall = (System.nanoTime() - t0) / 1e9
    assert(n == 800)
    assert(wall < 1.8, s"reduce tasks ran serially: $wall s")
  }
}
