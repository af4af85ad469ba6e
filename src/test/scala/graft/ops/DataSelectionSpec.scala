package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataSelectionSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("importance weights pull toward the target distribution") {
    // target speaks "alpha", the raw bulk speaks "beta"; a candidate
    // that echoes the target must out-weigh one that echoes the bulk
    val docs = Seq(
      (1L, true, "alpha alpha alpha alpha"),
      (2L, true, "alpha alpha alpha gamma"),
      (3L, false, "beta beta beta beta"),
      (4L, false, "beta beta beta delta"),
      (5L, false, "alpha alpha alpha alpha"), // target-like candidate
      (6L, false, "beta beta beta beta")      // bulk-like candidate
    ).toDF("doc_id", "is_t", "text")
    val w = DataSelection
      .importanceWeights(docs, col("is_t"), nBuckets = 64)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(2))
      .toMap
    // only the ORDERING is meaningful (add-1 smoothing over nBuckets
    // shifts all weights by a corpus-size constant on tiny fixtures);
    // resampling ranks by weight, so ordering is the contract
    assert(w(5L) > w(6L), s"target-like doc must out-weigh bulk-like: $w")
    assert(w(5L) == w(1L), s"identical text must get identical weight: $w")
    assert(w(6L) == w(3L), s"identical text must get identical weight: $w")
  }

  test("model is nBuckets-bounded regardless of vocabulary size") {
    val docs = Fixtures.documents(spark, sfDir)
    val model = DataSelection.importanceModel(docs, expr("lang = 'en'"), nBuckets = 16)
    assert(model.count() <= 16)
    // every corpus bucket accounted: raw count sums to total feature occurrences
    val Array(tr) = model.agg(sum("cr")).collect().map(_.getLong(0))
    val nFeats = DataSelection
      .hashedFeatures(docs, lit(false), 16)
      .count()
    assert(tr == nFeats)
  }

  test("gumbel resample is a deterministic top-k, invariant to partitioning") {
    val docs = Fixtures.documents(spark, sfDir)
    val weights = DataSelection.importanceWeights(docs, expr("lang = 'en'"), 64)
    val a = DataSelection.gumbelResample(weights, 20).collect().map(_.toSeq).toSeq
    val b = DataSelection
      .gumbelResample(weights.repartition(7), 20)
      .collect()
      .map(_.toSeq)
      .toSeq
    assert(a == b, "selection must be a pure function of doc ids and weights")
    assert(a.size == 20)
    // ranks follow (score desc, doc_id asc) exactly
    val scores = a.map(r => (r(5).asInstanceOf[Long], r(1).asInstanceOf[Long]))
    assert(scores == scores.sortBy { case (s, id) => (-s, id) })
  }

  test("resample plans a TakeOrderedAndProject, never a global sort of the corpus") {
    val docs = Fixtures.documents(spark, sfDir)
    val plan = DataSelection
      .gumbelResample(DataSelection.importanceWeights(docs, expr("lang = 'en'"), 64), 20)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("weights join the model broadcast — the corpus never shuffle-joins") {
    val docs = Fixtures.documents(spark, sfDir)
    val plan = DataSelection
      .importanceWeights(docs, expr("lang = 'en'"), 64)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), s"corpus-side shuffle join found:\n$plan")
  }
}
