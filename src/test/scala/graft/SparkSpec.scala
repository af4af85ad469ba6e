package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.concurrent.{Signaler, ThreadSignaler, TimeLimitedTests}
import org.scalatest.time.{Minutes, Span}

/** Shared local SparkSession for suites that need one. */
object TestSpark {
  lazy val spark: SparkSession = graft.ops.Fixtures
    .sessionBuilder("local[2]", "2")
    .appName("graft-tests")
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite with TimeLimitedTests {
  lazy val spark: SparkSession = TestSpark.spark

  /** Hang guard, not a perf budget: the r16 driver artifact recorded
    * `tests_ok: false` with a streaming write killed inside the JVM
    * shutdown hook — the signature of a wedged test being killed from
    * outside, which zeroes the whole suite's verdict. A test that
    * blocks (awaitTermination / processAllAvailable on a dead stream)
    * now FAILS individually after 10 minutes — two orders of magnitude
    * above any suite's normal per-test time — and the rest of the
    * suite still runs and reports. ThreadSignaler interrupts the stuck
    * thread, which Spark's blocking waits honor.
    */
  override val timeLimit: Span = Span(10, Minutes)
  override val defaultTestSignaler: Signaler = ThreadSignaler
}
