package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("separable classes classify perfectly; OOV-only docs fall back to the prior") {
    val train = Seq(
      (1L, "en", "good clean prose here"),
      (2L, "en", "good good clean text"),
      (3L, "de", "spam junk noise blob"),
      (4L, "de", "junk spam spam blob")
    ).toDF("doc_id", "lang", "text")
    val (model, priors) = QualityClassifier.trainModel(train, expr("lang = 'en'"), vocabCap = 64)
    val eval = Seq(
      (10L, "xx", "good clean"),   // positive vocabulary
      (11L, "xx", "spam junk"),    // negative vocabulary
      (12L, "xx", "zzz qqq")       // fully OOV
    ).toDF("doc_id", "lang", "text")
    val out = QualityClassifier
      .score(eval, model, priors)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(10L)._3 == 1L, s"positive-vocab doc must score positive: $out")
    assert(out(11L)._3 == 0L, s"negative-vocab doc must score negative: $out")
    assert(out(12L)._1 == 0L, "OOV doc has zero vocab tokens")
    // balanced classes → prior ln(2/2) = 0 → logodds exactly 0 → not > 0
    assert(out(12L)._2 == 0L && out(12L)._3 == 0L, s"OOV doc scores the prior alone: $out")
  }

  test("vocabulary is capped with a deterministic tie-break") {
    val train = Seq(
      (1L, "en", "aa bb cc dd"),
      (2L, "de", "aa bb cc dd")
    ).toDF("doc_id", "lang", "text")
    val (model, _) = QualityClassifier.trainModel(train, expr("lang = 'en'"), vocabCap = 2)
    val kept = model.select("token").collect().map(_.getString(0)).toSet
    assert(kept == Set("aa", "bb"), s"freq ties must break token-asc: $kept")
  }

  test("scoring joins the broadcast model — the corpus never shuffle-joins for it") {
    val docs = Fixtures.documents(spark, "/root/testdata/sf0.001")
    val (model, priors) =
      QualityClassifier.trainModel(docs.filter("doc_id % 2 = 0"), expr("lang = 'en'"), 128)
    val plan = QualityClassifier
      .score(docs.filter("doc_id % 2 <> 0"), model, priors)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), s"corpus-side shuffle join found:\n$plan")
  }

  test("calibration: buckets cover the holdout, rates bounded, separable corpus fills the extremes") {
    val d = "/root/testdata/sf0.001"
    val rows = QualityClassifier.nbCalibration(spark, d).collect()
    assert(rows.nonEmpty)
    val nHoldout = Fixtures.documents(spark, d).filter("NOT (doc_id % 2 = 0)").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nHoldout, "every holdout doc lands in a bucket")
    rows.foreach { r =>
      val (n, p, rate) =
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_positive"), r.getAs[Long]("pos_rate_micro"))
      assert(p <= n && rate >= 0L && rate <= 1000000L)
      assert(rate == p * 1000000L / n)
      assert(r.getAs[Long]("bucket") >= -8L && r.getAs[Long]("bucket") <= 8L)
    }
    // the en-vs-rest fixture classifier separates: the clamped extreme
    // buckets both exist and their rates order correctly
    val byBucket = rows.map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("pos_rate_micro")).toMap
    if (byBucket.contains(-8L) && byBucket.contains(8L))
      assert(byBucket(8L) >= byBucket(-8L))
  }
}
