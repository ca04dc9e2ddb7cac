package graft.ops

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Overlap INDEPENDENT eager Spark chains from driver threads (r20 —
  * guide §2.6 "overlap independent jobs": Spark's scheduler happily
  * runs several jobs at once inside one application; actions are only
  * sequential because driver code calls them sequentially). The rank
  * rows each run two iterative kernels (PageRank, HITS) whose
  * per-round actions are tiny — run them on two driver threads and
  * the wall is max(a, b) instead of a + b, with each kernel's own
  * computation (row values, qround lanes, checkpoint contents)
  * untouched. Results are whatever the thunks return; exceptions
  * propagate via Await. */
object Par {
  def two[A, B](a: => A, b: => B): (A, B) = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fa = Future(a)
    val fb = Future(b)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
  }
}
