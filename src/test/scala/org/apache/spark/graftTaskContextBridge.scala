package org.apache.spark

/** Test-only bridge into Spark's `private[spark]` task-context
  * lifecycle: run a block under a fresh synthetic TaskContext on the
  * CURRENT thread, then fire its completion listeners — the executor
  * lifecycle that task-scoped per-thread caches (NearestCell's unpack
  * memo) key on, reproduced deterministically for a spec. Real jobs
  * can't pin which of local[32]'s worker threads a task lands on, so
  * cross-task cache behavior is untestable through a job; this makes
  * the boundary explicit on one thread.
  */
object graftTaskContextBridge {
  def withTaskContext[T](f: => T): T = {
    val tc = TaskContext.empty()
    TaskContext.setTaskContext(tc)
    try {
      val r = f
      tc.markTaskCompleted(None) // completion listeners run on this thread
      r
    } finally TaskContext.unset()
  }
}
