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

  test("transition matrix: shares partition each from-type; pair mass = events minus one per user") {
    val d = "/root/testdata/sf0.001"
    val rows = Events.eventsTransitions(spark, d).collect()
    assert(rows.nonEmpty)
    // Σn over the matrix = Σ_users (events_u − 1)
    val ev = Fixtures.events(spark, d)
    val perUser = ev.groupBy("user_id").count().collect().map(_.getLong(1))
    assert(rows.map(_.getAs[Long]("n")).sum == perUser.map(_ - 1).sum)
    // shares within a from_type sum to ≤ 10^6 with only floor loss
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, g) =>
      val s = g.map(_.getAs[Long]("share_micro")).sum
      assert(s <= 1000000L && s > 1000000L - g.length, s"share sum $s over ${g.length} cells")
    }
  }

  test("retention triangle: offset-0 equals cohort size; no offset exceeds it; cohorts cover all users") {
    val d = "/root/testdata/sf0.001"
    val rows = Events.eventsRetention(spark, d).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[Long]("cohort_day"))
    val nUsers = Fixtures.events(spark, d).select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_.getAs[Long]("day_offset") == 0L).get.getAs[Long]("n_users")).sum == nUsers,
      "every user appears in exactly one cohort at offset 0")
    byCohort.values.foreach { g =>
      val base = g.find(_.getAs[Long]("day_offset") == 0L).get.getAs[Long]("n_users")
      g.foreach(r => assert(r.getAs[Long]("n_users") <= base, "retention cannot exceed cohort size"))
    }
  }
}
