package graft.ops

import graft.SparkSpec
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._

/** Cross-check: Spark MLlib's MinHashLSH finds the same planted
  * near-duplicates as the hand-rolled md5-banded implementation —
  * validating the hand-rolled path (which exists because it is
  * DuckDB-oracle-checkable and keeps everything in SQL expressions)
  * against the library implementation.
  */
class MinHashMlSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy cat near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (3L, "completely different content about spark catalyst optimizer rules and physical plans")
  ).toDF("doc_id", "text")

  test("MLlib MinHashLSH agrees with the hand-rolled LSH on planted near-dups") {
    val withTokens = corpus.withColumn("tokens", split(col("text"), " "))
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("features").setNumFeatures(1 << 18)
    val feat = tf.transform(withTokens)
    val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes").setNumHashTables(8).setSeed(42)
    val model = mh.fit(feat)
    val pairs = model
      .approxSimilarityJoin(feat, feat, 0.5, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"), col("dist"))
      .filter(col("a") < col("b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })

    val handRolled = Dedup
      .lshCandidatesWithJaccard(corpus, "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(handRolled == pairs)
  }
}
