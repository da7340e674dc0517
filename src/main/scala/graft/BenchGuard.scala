package graft

import org.apache.spark.sql.SparkSession

/** Wall-clock watchdog shared by [[Bench]]'s per-query timings and its
  * tail phases (RefBench / quality / NearDupBench / CurveBench).
  *
  * The round-13 driver bench stalled silently for an hour inside ONE
  * query and the round lost its perf signal; round 14 budgeted the
  * per-query loop but left the tail phases unprotected — a stall there
  * reproduces the same failure mode. Factored out so a forced-stall
  * spec can pin the behavior: past the budget the job group's jobs are
  * cancelled (interrupting tasks), the worker is interrupted (breaking
  * driver-side stalls: guard aggregations, collect loops), and the
  * caller gets a `Left("timeout: …")` instead of blocking the bench. */
object BenchGuard {
  /** Run `f` on a watchdog thread under Spark job group `bench-$name`
    * with a `budgetSec` wall-clock budget. Right(result) on success,
    * Left(message) on an exception or timeout; a timeout message
    * always starts with "timeout:" so callers can avoid retrying a
    * run that would just burn the budget again. */
  def budgeted[A](spark: SparkSession, name: String, budgetSec: Int)(
      f: => A): Either[String, A] = {
    @volatile var out: Either[String, A] = Left("watchdog: no result")
    val group = s"bench-$name"
    val t = new Thread(() => {
      // job-group + interruptOnCancel so cancelJobGroup reaches tasks
      spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
      try out = Right(f)
      catch { case e: Throwable => out = Left(e.toString.take(200)) }
      finally spark.sparkContext.clearJobGroup()
    }, s"bench-$name")
    t.setDaemon(true)
    t.start()
    t.join(budgetSec * 1000L)
    if (t.isAlive) {
      System.err.println(s"[bench] ${java.time.Instant.now()} TIMEOUT " +
        s"$name (${budgetSec}s) — cancelling job group")
      // …AndFutureJobs: a cancel landing between AQE stages must not
      // let the stalled work's NEXT job run; interrupt additionally
      // breaks driver-side stalls so the zombie can't keep contending
      // with every later measurement
      spark.sparkContext.cancelJobGroupAndFutureJobs(group)
      t.interrupt()
      t.join(30000L) // give cancellation a moment; daemon thread if not
      if (t.isAlive) System.err.println(
        s"[bench] WARNING $name still running after cancel — " +
          "timings below may be contended")
      Left(s"timeout: exceeded ${budgetSec}s budget")
    } else out
  }
}
