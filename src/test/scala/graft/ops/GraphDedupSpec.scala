package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected components: hand-graph correctness, chain contraction
  * (the case plain min-propagation needs O(diameter) rounds for),
  * determinism, and the cluster query's postconditions.
  */
class GraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphDedup
      .connectedComponents(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("two components and a singleton-free map") {
    // {1,2,3,4} via 1-2, 2-3, 3-4 and {10,11}
    val m = cc(Seq((2L, 1L), (3L, 2L), (3L, 4L), (10L, 11L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long chain contracts to one component rooted at its minimum") {
    // a 64-node path: diameter 63, far beyond the iteration cap if the
    // algorithm were plain neighbor-min propagation
    val m = cc((1L until 64L).map(i => (i, i + 1)))
    assert(m.keySet == (1L to 64L).toSet)
    assert(m.values.toSet == Set(1L))
  }

  test("duplicate, reversed and self-loop edges do not change the result") {
    val base = cc(Seq((1L, 2L), (2L, 3L)))
    val noisy = cc(Seq((2L, 1L), (1L, 2L), (3L, 2L), (2L, 3L), (1L, 1L), (3L, 3L)))
    assert(base == noisy)
  }

  test("empty edge set yields an empty component map") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("deterministic across runs") {
    val edges = (1L to 200L).flatMap(i => Seq((i, i % 17 + 1000L)))
    assert(cc(edges) == cc(edges))
  }

  test("dedup_clusters postconditions: total cover, min-rooted, sizes consistent") {
    val out = GraphDedup.dedupClusters(spark, "/root/testdata/sf0.001").cache()
    val n = out.count()
    assert(n == 500L)
    // every cluster id is the min doc_id of its members, and is itself
    // a member (is_rep flags exactly that row)
    val bad = out
      .groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("mn"), count(lit(1)).as("sz"), sum(col("is_rep")).as("reps"))
      .filter(col("mn") =!= col("cluster_id") || col("reps") =!= 1)
      .count()
    assert(bad == 0L, "cluster ids must be member minima with exactly one representative")
    // cluster_size matches the actual group size
    val szBad = out
      .groupBy(col("cluster_id"), col("cluster_size"))
      .agg(count(lit(1)).as("actual"))
      .filter(col("cluster_size") =!= col("actual"))
      .count()
    assert(szBad == 0L)
    out.unpersist()
  }
}
