package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Nanosecond-timestamp fidelity (SURVEY.md §7.4.1): the fixture's
  * `events.ts` is parquet TIMESTAMP(NANOS). Spark's native ceiling is
  * micros, so Fixtures.events carries the split-column answer:
  * `ts` (micros TimestampType) + `ts_nanos` (full fidelity Long).
  * DuckDB 1.0 reads the same file truncated to micros — the engine
  * here preserves strictly more precision than the oracle can see,
  * which is why this is a test, not an oracle query.
  */
class NanosFidelitySpec extends SparkSpec {

  test("ts_nanos preserves sub-microsecond precision; ts matches its truncation") {
    val ev = Fixtures.events(spark, "/root/testdata/sf0.001")
    val stats = ev
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("ts_nanos") % 1000 =!= 0, 1).otherwise(0)).as("n_submicro"),
        sum(when(unix_micros(col("ts")) =!= expr("ts_nanos div 1000"), 1).otherwise(0)).as("n_mismatch")
      )
      .head()
    assert(stats.getAs[Long]("n") > 0)
    // ts is exactly the micro-truncation of ts_nanos for every row
    assert(stats.getAs[Long]("n_mismatch") == 0)
    info(s"rows with sub-microsecond component: ${stats.getAs[Long]("n_submicro")} of ${stats.getAs[Long]("n")}")
  }
}
