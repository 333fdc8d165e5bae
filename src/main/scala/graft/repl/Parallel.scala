package graft.repl

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Concurrent Spark-job submission for per-table control-plane loops —
  * the engine's form of the reference's `hive.exec.parallel(.thread
  * .number=128)` (`/root/reference/HQL/replextload.hql:5-8`). Spark's
  * scheduler interleaves the jobs' tasks across the cluster; without
  * this, N small tables mean N sequential jobs with idle executors.
  * First failure propagates (fail-fast, like the reference's beeline
  * exit-code check).
  */
object Parallel {
  private val MaxConcurrentJobs = 8

  /** Run `body` over `items` on at most `maxConcurrent` threads (the pool
    * size IS the bound — excess items queue on the executor).
    */
  def foreach[A](items: Seq[A],
                 maxConcurrent: Int = MaxConcurrentJobs)(body: A => Unit): Unit = {
    if (items.size <= 1) { items.foreach(body); return }
    val pool = Executors.newFixedThreadPool(
      math.max(1, math.min(maxConcurrent, items.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try
      Await.result(Future.sequence(items.map(a => Future(body(a)))), Duration.Inf)
    finally pool.shutdown()
  }
}
