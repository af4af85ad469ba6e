package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the co-location tool for repeated large
  * joins (SURVEY.md §2.C DISTRIBUTE BY row; reference Db2/Netezza/
  * Teradata distribution keys map to bucketBy on write): two tables
  * bucketed by the same key and bucket count join WITHOUT a shuffle —
  * at 100 TB this converts every recurrent fact-fact join from a full
  * exchange into local zipped bucket scans.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * sort-merge joins also skip the sort).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int
  ): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Count shuffle exchanges in a query's executed plan (0 for a
    * co-located bucket join).
    */
  def shuffleCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size

  /** The distribution-key DDL maps onto this: apply a table's declared
    * DISTRIBUTE BY as a bucketed write.
    */
  def applyDistribution(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      distColumns: Seq[String],
      nBuckets: Int = 32
  ): Unit =
    distColumns match {
      case head +: _ => writeBucketed(df, table, head, nBuckets)
      case _ => df.write.mode("overwrite").format("parquet").saveAsTable(table)
    }
}
