package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("fused top-k aggregator matches the explode/count/rank formulation") {
    val docs = graft.ops.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val tokens = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .as[(String, String)]

    val topk = new TopKAggregator(5).toColumn
    val fused = tokens
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(topk.name("top"))
      .collect()
      .map { case (lang, tk) => lang -> tk }
      .toMap

    val viaQuery = graft.ops.TextAnalysis
      .topTokensPerLang(spark, "/root/testdata/sf0.001")
      .collect()
      .groupBy(_.getAs[String]("lang"))
      .map { case (lang, rows) =>
        lang -> rows.sortBy(_.getAs[Long]("rank")).map(r => (r.getAs[String]("token"), r.getAs[Long]("n"))).toSeq
      }

    assert(fused.keySet == viaQuery.keySet)
    fused.foreach { case (lang, tk) => assert(tk == viaQuery(lang), s"lang=$lang") }
  }

  test("tie-breaking is deterministic (count desc, token asc)") {
    val ds = Seq("b", "a", "a", "b", "c").toDS()
    val out = ds.groupByKey(_ => 1).mapValues(identity).agg(new TopKAggregator(3).toColumn).collect()
    assert(out.head._2 == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }
}
