package graft.ext

/** Run INDEPENDENT Spark actions concurrently from the driver (the
  * optimization-guide §2.6 overlap: actions are only sequential because
  * driver code calls them sequentially — submitting independent jobs
  * from two threads lets the scheduler back-fill the first job's task
  * tail and commit wait with the second job's tasks). FIFO scheduling
  * keeps the first job's resource priority, which is exactly the
  * back-fill behavior wanted.
  *
  * Use ONLY for actions with no ordering dependency: distinct output
  * directories, no shared mutable state, no read-after-write between
  * them (e.g. an index's band table and its shingle sidecar — two
  * writes derived independently from the same input). Blocks until
  * every action completes; the first failure rethrows its original
  * exception (unwrapped), after the others finish or fail, so error
  * semantics match the sequential form.
  */
private[graft] object ParJobs {
  def apply(thunks: (() => Unit)*): Unit = {
    require(thunks.nonEmpty, "ParJobs: no actions")
    if (thunks.size == 1) { thunks.head(); return }
    val pool =
      java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        })
      }
      var firstErr: Throwable = null
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstErr == null) firstErr = e.getCause
        }
      }
      if (firstErr != null) throw firstErr
    } finally pool.shutdown()
  }
}
