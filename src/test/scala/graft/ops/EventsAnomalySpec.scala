package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventsAnomalySpec extends SparkSpec {
  import spark.implicits._

  test("integer z-test flags a crafted spike and nothing in a flat series") {
    // replicate the query's core on crafted hourly counts: 40 flat
    // hours at 10 plus one 100-count spike
    def flags(counts: Seq[(String, Long, Long)]): Seq[Long] = {
      val hourly = counts.toDF("event_type", "hour_bucket", "n")
      val stats = hourly
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("bigint").as("H"),
          sum(col("n")).cast("bigint").as("S"),
          sum(col("n") * col("n")).cast("bigint").as("SS")
        )
      hourly
        .join(stats, "event_type")
        .filter(
          col("n") * col("H") > col("S") &&
            (col("n") * col("H") - col("S")) * (col("n") * col("H") - col("S")) >
              lit(9L) * (col("H") * col("SS") - col("S") * col("S"))
        )
        .select("hour_bucket")
        .collect()
        .map(_.getLong(0))
        .toSeq
    }
    val flat = (0L until 40L).map(h => ("a", h, 10L))
    assert(flags(flat).isEmpty, "a flat series must not flag")
    val spiked = flat :+ (("a", 99L, 100L))
    assert(flags(spiked) == Seq(99L), "the spike hour must flag, and only it")
  }

  test("fixture run matches the documented integer-overflow headroom") {
    val out = Events.eventsAnomaly(spark, "/root/testdata/sf0.001").collect()
    // flagged hours exist and every count stays far inside the n*H bound
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n") < 3000000000L / 1000))
  }
}
