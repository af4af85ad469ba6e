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
}
