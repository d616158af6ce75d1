package graft.ops

/** Driver-side overlap of INDEPENDENT Spark actions (guide §2.6): Spark's
  * scheduler happily runs several jobs at once inside one application —
  * actions are only sequential because driver code calls them
  * sequentially. Operators that run a sequence of independent fits
  * (the m per-subspace KMeans fits of a PQ/OPQ build, a coarse fit
  * beside them) submit them from this bounded pool so one fit's task
  * tail back-fills with the next fit's tasks instead of leaving the
  * executor pool idle.
  *
  * Determinism: each task is an unchanged, self-contained Spark action
  * (seeded fit over an immutable frame); concurrency changes WHEN jobs
  * run, never what any single job computes — each job's partition
  * structure, seeds, and reduce trees are what they were sequentially.
  * Results return in INPUT order, so callers see the exact sequence
  * the sequential loop produced.
  *
  * Failure: the first failing task's exception propagates (after all
  * tasks settle, so no job leaks into a caller's next stage); the pool
  * is per-call and always torn down.
  */
private[graft] object Par {

  /** Fixed fan-out: enough to run a coarse + m = 4-subspace fit batch
    * fully overlapped (the common PQ shape here — each fit's jobs are
    * a handful of small tasks, nowhere near the executor pool), small
    * enough that wider fan-outs don't thrash the scheduler (guide
    * §2.6's "a few jobs in flight" rule, widened for tiny fits). */
  private val MaxConcurrent = 6

  /** Run `tasks` concurrently (at most [[MaxConcurrent]] in flight),
    * returning results in input order. Single task short-circuits to a
    * plain call — no pool, no thread handoff. */
  def run[A](tasks: Seq[() => A]): Seq[A] = {
    if (tasks.lengthCompare(1) <= 0) return tasks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(MaxConcurrent, tasks.size),
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-par-${n.getAndIncrement()}")
          t.setDaemon(true)
          t
        }
      })
    try {
      val futures = tasks.map(t => pool.submit(
        new java.util.concurrent.Callable[A] { override def call(): A = t() }))
      // collect in order; ExecutionException unwraps to the task's own
      // exception so callers see the same failure the sequential loop
      // would have thrown
      futures.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally pool.shutdown()
  }
}
