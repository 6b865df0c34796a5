package graft.operators

import org.apache.spark.sql.DataFrame

/** Concurrent materialization of INDEPENDENT legs inside one query
  * (guide §2.6 "overlap independent jobs"): Spark's scheduler happily
  * runs several jobs at once — legs are only sequential because the
  * driver code calls their actions sequentially. Queries that pay two
  * independent materialization legs (x103's lexical + dense retriever
  * legs, x141's two contraction loops) submit them from separate
  * threads so the second leg's tasks back-fill executors freed by the
  * first leg's tail instead of waiting for it to finish.
  *
  * Determinism: every leg is a deterministic relation; concurrent
  * scheduling changes only wall-clock interleaving, never results.
  * Thread-safety: DataFrame plans are immutable and RDD actions are
  * thread-safe; legs are CONSTRUCTED on the caller thread where that
  * matters (each thunk builds and materializes its own leg). A leg
  * failure propagates out of the await exactly as it would inline.
  */
private[operators] object Par {
  /** Run both thunks concurrently; return their results. */
  def both[A, B](fa: => A, fb: => B): (A, B) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fut = Future(fb)
    val a = fa // first leg on the calling thread — no pool starvation
    val b = Await.result(fut, Duration.Inf)
    (a, b)
  }

  /** [[both]] specialized to two DataFrame legs. */
  def bothDF(fa: => DataFrame, fb: => DataFrame): (DataFrame, DataFrame) =
    both(fa, fb)
}
