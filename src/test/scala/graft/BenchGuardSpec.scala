package graft

/** Forced-stall coverage for the bench watchdog ([[BenchGuard]]): the
  * r13 driver bench lost its round to ONE silently stalled query; r14
  * budgeted the query loop but not the tail phases. This pins the
  * contract every budgeted call site (queries AND phases) relies on:
  * a stall is cut off at the budget, reported as a Left("timeout: …"),
  * and the caller's thread is never blocked past budget + cancel grace. */
class BenchGuardSpec extends SparkSuite {

  test("fast work passes through with its result") {
    assert(BenchGuard.budgeted(spark, "fast", 60)(21 * 2) == Right(42))
  }

  test("an exception becomes a Left, not a crash") {
    val r = BenchGuard.budgeted(spark, "boom", 60) {
      throw new IllegalStateException("synthetic failure")
    }
    assert(r.isLeft)
    assert(r.swap.exists(_.contains("synthetic failure")))
  }

  test("a stalled Spark job is cancelled at the budget and reported as timeout") {
    val t0 = System.nanoTime()
    val r = BenchGuard.budgeted(spark, "stall", 2) {
      // every task sleeps far past the budget — the r13 failure shape
      spark.range(4).repartition(4)
        .foreach(_ => Thread.sleep(120000L))
    }
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(r.swap.exists(_.startsWith("timeout:")), s"got $r")
    // budget (2s) + cancellation grace (30s) is the contract ceiling;
    // in practice interruptOnCancel lands in well under a second
    assert(elapsedSec < 35.0, f"watchdog blocked for $elapsedSec%.1fs")
  }

  test("a driver-side stall (no Spark job) is interrupted and reported") {
    val r = BenchGuard.budgeted(spark, "driver-stall", 1) {
      try Thread.sleep(120000L)
      catch { case _: InterruptedException => () } // swallowing is fine:
      // the watchdog already returned Left(timeout) to the caller
    }
    assert(r.swap.exists(_.startsWith("timeout:")), s"got $r")
  }
}
