package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession

/** Driver-side overlap of INDEPENDENT Spark actions (optimization
  * guide §2.6: actions are only sequential because driver code calls
  * them sequentially — submit independent ones from driver threads so
  * each job's stage tail back-fills the others' idle executors).
  *
  * Why not `Future` on the global pool + `Await.result(…, Inf)`
  * (the r20 form this replaces):
  *
  *  - ATTRIBUTION: SparkContext local properties (job description /
  *    group) ride an InheritableThreadLocal, captured when a pool
  *    THREAD is created — a shared global-pool thread born during an
  *    earlier query permanently mislabels every job it later submits.
  *    [[future]] re-applies the SUBMITTING thread's description/group
  *    inside the task (and clears them after), so concurrent jobs are
  *    labeled correctly no matter which pooled thread runs them.
  *  - STARVATION: the fan-outs nest (tracking_verify fans out splits
  *    whose metrics rows each fan out three counts) — a bounded shared
  *    pool can deadlock with outer tasks holding every thread while
  *    waiting on inner ones. A dedicated cached pool grows on demand
  *    (fan-out width is small and bounded by the call sites), idles
  *    threads away after 60 s, and isolates Spark-action overlap from
  *    unrelated global-pool load.
  *  - DIAGNOSTICS: `Await.result(…, Duration.Inf)` turns one hung tier
  *    into a silently hung query. A generous finite ceiling (default
  *    600 s, `-Dgraft.overlap.timeout.s=`) preserves behavior for every
  *    completing job and fails LOUDLY — naming this mechanism — for a
  *    hung one.
  */
object Overlap {

  private val timeout: FiniteDuration =
    sys.props.getOrElse("graft.overlap.timeout.s", "600").toLong.seconds

  private lazy val pool: ExecutionContext = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool { r =>
        val t = new Thread(r, s"graft-overlap-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      })
  }

  /** Run `body` (typically one or more Spark actions) on the dedicated
    * pool, carrying the submitting thread's job description and group
    * onto the worker for the duration of the task. */
  def future[T](s: SparkSession)(body: => T): Future[T] = {
    val sc = s.sparkContext
    val desc = sc.getLocalProperty("spark.job.description")
    val group = sc.getLocalProperty("spark.jobGroup.id")
    Future {
      sc.setLocalProperty("spark.job.description", desc)
      sc.setLocalProperty("spark.jobGroup.id", group)
      try body
      finally {
        sc.setLocalProperty("spark.job.description", null)
        sc.setLocalProperty("spark.jobGroup.id", null)
      }
    }(pool)
  }

  /** Await every future, failing loudly (naming the mechanism and the
    * ceiling) if the batch does not complete within the configured
    * timeout — a hung tier must not hang the query forever. */
  def await[T](fs: Seq[Future[T]]): Seq[T] =
    try Await.result(Future.sequence(fs)(implicitly, pool), timeout)
    catch {
      case e: java.util.concurrent.TimeoutException =>
        throw new IllegalStateException(
          s"Overlap.await: concurrent Spark actions did not complete " +
            s"within $timeout (raise -Dgraft.overlap.timeout.s); a tier " +
            "is hung or the cluster is starved", e)
    }

  /** Submit each thunk with [[future]] and await them all: the values
    * come back in DECLARATION order regardless of completion order. */
  def all[T](s: SparkSession)(bodies: (() => T)*): Seq[T] =
    await(bodies.map(b => future(s)(b())))
}
