package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed quality → exact-dedup → near-dup pipeline. */
class PipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("stages only ever shrink the corpus and each stage is load-bearing") {
    val (flagged, exactKept, finalKept) = Pipeline.stages(Fixtures.documents(spark, sfDir))
    val nIn = flagged.count()
    val nQ = flagged.filter(col("quality_pass")).count()
    val nE = exactKept.count()
    val nF = finalKept.count()
    assert(nIn >= nQ && nQ >= nE && nE >= nF)
    assert(nQ < nIn, "quality stage should reject something on the fixture corpus")
    assert(nF < nE, "near-dup stage should drop something on the fixture corpus")
    assert(nF > 0)
  }

  test("postcondition: no verified near-dup pair survives the pipeline") {
    // keep-earliest drops doc_b of every verified pair, so by
    // construction the final set can contain no verified pair at all —
    // the defining property of a deduplicated corpus
    val (_, _, finalKept) = Pipeline.stages(Fixtures.documents(spark, sfDir))
    val remaining = Dedup
      .lshCandidatesWithJaccard(finalKept, "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
      .count()
    assert(remaining == 0, s"$remaining verified pairs left after dedup")
    // and exact survivors are content-distinct
    assert(
      finalKept.select(md5(col("text").cast("binary"))).distinct().count() == finalKept.count()
    )
  }

  test("stagesFull: the two new stages shrink monotonically and repetition CAN drop") {
    import spark.implicits._
    // the fixture corpus has no within-doc chunk repetition (the
    // accounting shows stage 4 as a fixture no-op), so prove the rule
    // fires on a crafted looping doc injected through the same path
    val loop = (("the a of to and in good text here now word more " * 2).trim + " ") * 8
    val crafted = Seq((900001L, loop.trim, "en", "src0", loop.trim.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val docs = Fixtures.documents(spark, sfDir).unionByName(crafted)
    val (_, _, near, rep, mix) = Pipeline.stagesFull(docs)
    val nNear = near.count(); val nRep = rep.count(); val nMix = mix.count()
    assert(nRep <= nNear && nMix <= nRep, "stages must only shrink")
    assert(near.filter(col("doc_id") === 900001L).count() == 1L, "crafted doc must reach stage 4")
    assert(rep.filter(col("doc_id") === 900001L).count() == 0L, "looping doc must be dropped by the repetition rule")
    assert(nMix < nRep, "mixture must drop non-en docs on the fixture")
  }

  test("quality_features agrees with the standalone gates it composes") {
    val f = Pipeline.qualityFeatures(spark, sfDir).cache()
    // the stats rule is bit-identical to text_stats' quality flag
    val ts = TextAnalysis
      .textStats(spark, sfDir)
      .select(col("doc_id"), when(col("quality") === "ok", 1L).otherwise(0L).as("qp"))
    assert(f.join(ts, "doc_id").filter(col("quality_pass") =!= col("qp")).count() == 0L)
    // the NLL column is bit-identical to perplexity_score's
    val pp = CorpusStats
      .perplexityScore(spark, sfDir)
      .select(col("doc_id"), col("avg_nll_micro").as("nll2"))
    assert(f.join(pp, "doc_id").filter(col("avg_nll_micro") =!= col("nll2")).count() == 0L)
    // composite stays in its declared range
    assert(f.filter(col("score_micro") < 0 || col("score_micro") > 3000000).count() == 0L)
    f.unpersist()
  }

  test("curriculum_order ranks by score within each shard") {
    val out = Pipeline.curriculumOrder(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq == (1L to byRank.length).toSeq)
      val scores = byRank.map(_.getAs[Long]("score_micro")).toSeq
      assert(scores == scores.sorted.reverse, s"scores not descending: $scores")
    }
  }
}
