package graft.util

/** Driver-side fan-out of INDEPENDENT tiny Spark jobs (optimization guide
  * §2.6 — "overlap independent jobs"): one-row sidecar parquet writes and
  * per-batch watermark marks are dominated by per-job scheduling latency
  * (~50-120 ms each measured), not by work, so submitting them from a small
  * thread pool overlaps those latencies instead of paying them serially.
  * Spark's scheduler runs concurrent jobs FIFO and job submission is
  * thread-safe. Not intended for data jobs — those saturate the executors
  * on their own.
  */
object Par {

  /** Apply `f` to every item, fanning out over up to `parallelism` driver
    * threads; blocks until all complete. The first failure propagates with
    * its ORIGINAL exception (callers' loud-failure contracts — e.g.
    * SinkFs.deleteLoud — must survive the pool boundary); remaining tasks
    * are cancelled best-effort.
    */
  def run[A](items: Seq[A], parallelism: Int = 8)(f: A => Unit): Unit = {
    if (items.sizeIs <= 1) { items.foreach(f); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, items.size))
    try {
      val futs = items.map(a =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = f(a)
        }))
      try futs.foreach(_.get())
      catch {
        case e: java.util.concurrent.ExecutionException =>
          futs.foreach(_.cancel(false))
          throw Option(e.getCause).getOrElse(e)
      }
    } finally pool.shutdown()
  }
}
