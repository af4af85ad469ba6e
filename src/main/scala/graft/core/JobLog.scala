package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Job/step logging — the QUERY_WRAPPER analog (SURVEY.md §2.H #80;
  * reference delta_import:331-342, ETL.QUERY_WRAPPER): every executed
  * step is recorded (job, step ordinal, action, status, rows,
  * duration) and the log is persistable as a table, so a run is
  * auditable and resumable. Wall-clock is injected so tests are
  * deterministic and the log itself stays a pure value.
  */
final class JobLog(jobName: String, clock: () => Long = () => System.nanoTime()) {

  final case class Entry(
      job_name: String,
      step: Int,
      action: String,
      status: String,
      rows: Long,
      duration_ms: Long
  )

  private val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]
  private var stepCounter = 0

  /** Run one step, timing it and recording outcome; rethrows after
    * logging so failure handling stays with the caller (the
    * reference's wrapper also logs-then-continues or aborts per
    * policy).
    */
  def step[A](action: String, rowCount: A => Long = (_: A) => -1L)(body: => A): A = {
    stepCounter += 1
    val n = stepCounter
    val t0 = clock()
    try {
      val out = body
      entries += Entry(jobName, n, action, "ok", rowCount(out), (clock() - t0) / 1000000L)
      out
    } catch {
      case e: Exception =>
        entries += Entry(jobName, n, action, s"error: ${e.getMessage}", -1L, (clock() - t0) / 1000000L)
        throw e
    }
  }

  def log: Seq[Entry] = entries.toSeq

  def toDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.toSeq.toDF()
  }

  /** Persist the log as an appendable parquet audit table. */
  def persist(spark: SparkSession, path: String): Unit =
    toDf(spark).write.mode("append").parquet(path)
}
