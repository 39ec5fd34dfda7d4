package graft.functions

/** Driver-side action overlap (spark optimization guide §2.6): Spark's
  * scheduler runs several jobs at once inside one application — actions
  * are sequential only because driver code calls them sequentially. For
  * INDEPENDENT blocks (disjoint stores/directories/frames), running one
  * on a pool thread lets its jobs back-fill executors idled by the
  * other's broadcast builds and stage tails, and overlaps the two
  * blocks' driver-side planning. Results are unchanged by construction:
  * the blocks must not read or write each other's state.
  */
object Par {
  /** N-way [[inParallel]] for uniform independent blocks (e.g. several
    * batch landings into DISJOINT `batch_id=` directories of one store
    * at a fixed generation — the single-writer discipline concerns
    * concurrent append/compact cycles, not co-landing distinct batch
    * dirs under a static layout). Every block is awaited even on
    * failure (nothing may leak into a later query's timing window);
    * the first failure rethrows.
    */
  def all[A](blocks: (() => A)*): Seq[A] = {
    import scala.concurrent.{Await, ExecutionContext, Future, blocking}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = blocks.map(b => Future(blocking(b())))
    val results = fs.map(f =>
      try Right(Await.result(f, Duration.Inf))
      catch { case t: Throwable => Left(t) })
    results.collectFirst { case Left(t) => throw t }
    results.collect { case Right(a) => a }
  }

  def inParallel[A, B](a: => A, b: => B): (A, B) = {
    import scala.concurrent.{Await, ExecutionContext, Future, blocking}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fb = Future(blocking(b))
    // run `a` on the calling thread (no pool hop); if it fails, still
    // drain `b` so its in-flight jobs cannot leak into a later query's
    // timing window
    val ra =
      try a
      catch { case t: Throwable =>
        try Await.result(fb, Duration.Inf) catch { case _: Throwable => () }
        throw t
      }
    (ra, Await.result(fb, Duration.Inf))
  }
}
