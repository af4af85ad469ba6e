package graft.core

/** Overlap INDEPENDENT driver-side actions (guide §2.6: Spark happily
  * runs several jobs at once inside one application; actions are only
  * sequential because driver code calls them sequentially).
  *
  * The per-micro-batch index applies and the compactions launch 3-6
  * small, mutually independent write jobs over distinct relation dirs;
  * run serially each pays the full plan+schedule+commit floor back to
  * back, while the cluster sits near-idle (the per-job data is
  * increment-sized). Submitting them from a small thread pool overlaps
  * those floors AND lets one job's task tail back-fill with the next
  * job's tasks — the wall cost per batch approaches max(job) instead
  * of sum(job). Plain FIFO scheduling is exactly the back-fill
  * behaviour wanted; threads are created per call so Spark's
  * inheritable thread-locals (job group, scheduler pool) carry over.
  *
  * All thunks are awaited before the first failure is rethrown — a
  * failed sibling never leaves another thunk racing the caller's
  * cleanup.
  */
object Par {
  def run(thunks: (() => Unit)*): Unit = {
    if (thunks.size <= 1) { thunks.foreach(t => t()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] { def call(): Unit = t() })
      }
      val results = futs.map(f => scala.util.Try(f.get()))
      results.foreach {
        case scala.util.Failure(e: java.util.concurrent.ExecutionException) =>
          throw Option(e.getCause).getOrElse(e)
        case scala.util.Failure(e) => throw e
        case _                     => ()
      }
    } finally pool.shutdown()
  }
}
