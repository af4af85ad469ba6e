package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("co-bucketed tables join without any shuffle exchange") {
    val orders = graft.ops.Fixtures.orders(spark, "/root/testdata/sf0.001")
    val lineitem = graft.ops.Fixtures.lineitem(spark, "/root/testdata/sf0.001")

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 4)

    val joined = spark
      .table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

    // disable broadcast so the join itself must choose SMJ — the point
    // is that bucketing removes the exchanges under it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan
      val joinShuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // only the final single-partition agg/sort may shuffle; the join inputs must not
      assert(
        joinShuffles.size <= 1,
        s"expected bucket join without input exchanges, got ${joinShuffles.size}:\n$plan"
      )
      // and the result is correct
      val total = joined.collect().map(_.getAs[Long]("n")).sum
      assert(total == lineitem.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("applyDistribution uses the declared distribution key") {
    val nation = graft.ops.Fixtures.nation(spark, "/root/testdata/sf0.001")
    Bucketing.applyDistribution(spark, nation, "b_nation", Seq("n_regionkey"), 2)
    try {
      assert(spark.table("b_nation").count() == nation.count())
      val meta = spark.sql("DESCRIBE TABLE EXTENDED b_nation").collect().map(_.mkString(" ")).mkString("\n")
      assert(meta.contains("n_regionkey"))
    } finally spark.sql("DROP TABLE IF EXISTS b_nation")
  }
}
