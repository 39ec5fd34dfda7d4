package graft.functions

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future, blocking}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.SparkSession

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
  /** Dedicated DAEMON pool. `ExecutionContext.global` was wrong two
    * ways: its threads are created once per JVM and INHERIT Spark's
    * thread-local job properties (group id, description) from whichever
    * thread happened to force them — so jobs launched later from those
    * threads mis-attribute in the UI and hold membership in long-dead
    * job groups (the DAGScheduler "Failed to cancel job group" warnings
    * in the streaming spec tail). CACHED, not fixed-size: Par blocks
    * legitimately nest (an entry-level overlap around kernels that
    * overlap internally, under Verify's query pool) and a bounded pool
    * blocked awaiting its own descendants deadlocks; thread count stays
    * small in practice because [[inParallel]] runs its first block on
    * the calling thread.
    */
  private lazy val pool: ExecutionContext = ExecutionContext.fromExecutor(
    Executors.newCachedThreadPool(new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-par-${n.incrementAndGet()}")
        t.setDaemon(true); t
      }
    }))

  /** Spark job properties worth carrying from the submitting thread to
    * the pool thread (guide §1.5: description/group are thread-local,
    * "which matters if you submit jobs from several threads").
    */
  private val PropKeys = Seq("spark.jobGroup.id", "spark.job.description",
    "spark.job.interruptOnCancel", "spark.scheduler.pool")

  /** Wrap a block so it runs under the CALLER's active session and job
    * properties, and leaves the pool thread clean afterwards (a cached
    * thread must not leak one block's group id into the next block's
    * jobs — that is exactly the global-EC defect this pool replaces).
    */
  private def propagating[A](b: () => A): () => A = {
    val session = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
    val props = session.map(s =>
      PropKeys.map(k => k -> s.sparkContext.getLocalProperty(k)))
    () => session match {
      case None => b()
      case Some(s) =>
        SparkSession.setActiveSession(s)
        // null values CLEAR a stale inherited property — propagate the
        // caller's absence of a group as faithfully as its presence
        props.get.foreach { case (k, v) => s.sparkContext.setLocalProperty(k, v) }
        try b()
        finally {
          PropKeys.foreach(k => s.sparkContext.setLocalProperty(k, null))
          SparkSession.clearActiveSession()
        }
    }
  }

  /** N-way [[inParallel]] for uniform independent blocks (e.g. several
    * batch landings into DISJOINT `batch_id=` directories of one store
    * at a fixed generation — the single-writer discipline concerns
    * concurrent append/compact cycles, not co-landing distinct batch
    * dirs under a static layout). Every block is awaited even on
    * failure (nothing may leak into a later query's timing window);
    * the first failure rethrows.
    */
  def all[A](blocks: (() => A)*): Seq[A] = {
    implicit val ec: ExecutionContext = pool
    val fs = blocks.map(b => { val p = propagating(b); Future(blocking(p())) })
    val results = fs.map(f =>
      try Right(Await.result(f, Duration.Inf))
      catch { case t: Throwable => Left(t) })
    results.collectFirst { case Left(t) => throw t }
    results.collect { case Right(a) => a }
  }

  def inParallel[A, B](a: => A, b: => B): (A, B) = {
    implicit val ec: ExecutionContext = pool
    val pb = propagating(() => b)
    val fb = Future(blocking(pb()))
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
