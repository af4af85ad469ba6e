package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureCorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSample keeps rate≈target per stratum and is append-stable") {
    val docs = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "xx")).toDF("doc_id", "lang")
    val kept = Mixture
      .stratifiedSample(docs, "doc_id", "lang", Map("en" -> 1.0), 0.4)
      .groupBy("lang")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(kept("en") == 1000L, "rate 1.0 must keep everything")
    assert(kept("xx") > 300L && kept("xx") < 500L, s"rate 0.4 of 1000 ≈ 400, got ${kept("xx")}")
    // append-stability: a doc's fate is unchanged when the corpus grows
    val before = Mixture
      .stratifiedSample(docs.filter(col("doc_id") <= 1000), "doc_id", "lang", Map("en" -> 1.0), 0.4)
      .select("doc_id").as[Long].collect().toSet
    val after = Mixture
      .stratifiedSample(docs, "doc_id", "lang", Map("en" -> 1.0), 0.4)
      .filter(col("doc_id") <= 1000)
      .select("doc_id").as[Long].collect().toSet
    assert(before == after)
  }

  test("stratifiedSample is a map-side filter — no shuffle in the plan") {
    // in-memory relation: the fixture reader's own repartition would
    // otherwise show its (pre-filter) Exchange
    val docs = (1L to 100L).map(i => (i, if (i % 2 == 0) "en" else "xx")).toDF("doc_id", "lang")
    val plan = Mixture
      .stratifiedSample(docs, "doc_id", "lang", Map("en" -> 1.0), 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("tfidf: a term unique to one doc outranks corpus-wide terms there") {
    val out = CorpusStats.tfidfTopTerms(spark, "/root/testdata/sf0.001")
    val r = out.filter(col("rank") === 1).limit(5).collect()
    assert(r.nonEmpty)
    // rank-1 rows must have the max score within their doc (window proof)
    val bad = out
      .groupBy("doc_id")
      .agg(max(when(col("rank") === 1, col("score_micro"))).as("r1"), max(col("score_micro")).as("mx"))
      .filter(col("r1") =!= col("mx"))
      .count()
    assert(bad == 0L)
  }

  test("perplexity: repeating the corpus's most common tokens scores lower than rare ones") {
    val out = CorpusStats.perplexityScore(spark, "/root/testdata/sf0.001").cache()
    assert(out.count() == 500L)
    // avg_nll bounds: every per-token nll is positive and finite
    assert(out.filter(col("avg_nll_micro") <= 0L).count() == 0L)
    // exact-integer contract: avg = floor(total/n)
    val inconsistent = out
      .filter(col("avg_nll_micro") =!= floor(col("total_nll_micro") / col("n_tokens")).cast("bigint"))
      .count()
    assert(inconsistent == 0L)
    out.unpersist()
  }

  test("tfidf and perplexity model sides broadcast — corpus join is map-side") {
    val plan = CorpusStats.perplexityScore(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"model join must broadcast:\n$plan")
  }
}
