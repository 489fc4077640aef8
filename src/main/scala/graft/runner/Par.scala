package graft.runner

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Concurrent driver-side job submission (optimization guide §2.6):
  * Spark's scheduler runs several jobs at once inside one application —
  * actions are only sequential because driver code calls them
  * sequentially. Independent pipeline steps (the four dim upserts of a
  * tick, the four dim builds of a bulk rebuild) each consist of several
  * small actions (high-water-mark agg, anti-join checkpoint, emptiness
  * probe, append write); run serially every one of those pays its full
  * scheduler latency end-to-end, while the executor pool sits mostly
  * idle. Submitting them from a small thread pool lets one step's tasks
  * back-fill the cores another step's tail leaves free — the same wall
  * clock win on local[32] and on a cluster, because it removes serial
  * driver latency, not compute.
  *
  * FIFO scheduling (the default) is exactly the back-fill behaviour
  * wanted here; the pool is shared and daemon so it never blocks JVM
  * exit.
  */
object Par {
  lazy val ec: ExecutionContext = ExecutionContext.fromExecutorService(
    java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-par")
      t.setDaemon(true)
      t
    }))

  /** Evaluate the four thunks concurrently, return their results in
    * order. Exceptions propagate to the caller (first failure wins).
    */
  def par4[A, B, C, D](a: => A, b: => B, c: => C, d: => D): (A, B, C, D) = {
    implicit val e: ExecutionContext = ec
    val (fa, fb, fc, fd) = (Future(a), Future(b), Future(c), Future(d))
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf),
      Await.result(fc, Duration.Inf), Await.result(fd, Duration.Inf))
  }

  /** Three-way [[par4]]. */
  def par3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    implicit val e: ExecutionContext = ec
    val (fa, fb, fc) = (Future(a), Future(b), Future(c))
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf),
      Await.result(fc, Duration.Inf))
  }

  /** Two-way [[par4]]. */
  def par2[A, B](a: => A, b: => B): (A, B) = {
    implicit val e: ExecutionContext = ec
    val (fa, fb) = (Future(a), Future(b))
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
  }
}
