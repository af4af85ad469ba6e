package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilarityIvfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("IVF assignments partition every vector into exactly one list") {
    val (assigned, model) = Similarity.ivfAssignments(Fixtures.embeddings(spark, dir), 8)
    val total = Fixtures.embeddings(spark, dir).count()
    assert(assigned.count() == total)
    assert(model.clusterCenters.length == 8)
    val lists = assigned.groupBy("list_id").count().collect()
    assert(lists.map(_.getAs[Long]("count")).sum == total)
  }

  test("IVF top-k recall vs brute force is reasonable at nProbe=4/8") {
    val emb = Fixtures.embeddings(spark, dir)
    val brute = Similarity
      .cosineTopK(emb, 0L, 10)
      .collect()
      .map(_.getAs[Long]("vec_id"))
      .toSet
    val ivf = Similarity
      .ivfTopK(emb, 0L, 10, nLists = 8, nProbe = 4)
      .collect()
      .map(_.getAs[Long]("vec_id"))
      .toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall too low (brute=$brute ivf=$ivf)")
    // probing ALL lists must recover brute force exactly
    val full = Similarity
      .ivfTopK(emb, 0L, 10, nLists = 8, nProbe = 8)
      .collect()
      .map(_.getAs[Long]("vec_id"))
      .toSet
    assert(full == brute)
  }

  test("persisted IVF index serves queries identically and prunes list partitions") {
    val emb = Fixtures.embeddings(spark, dir)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.saveIvfIndex(emb, nLists = 8, idx)
    // same results as the rebuild-per-query path at the same probes
    val live = Similarity.ivfTopK(emb, 0L, 10, nLists = 8, nProbe = 4).collect().map(_.getLong(0)).toSeq
    val fromIndex = Similarity.ivfTopKFromIndex(spark, idx, 0L, 10, nProbe = 4)
    assert(fromIndex.collect().map(_.getLong(0)).toSeq == live)
    // the probe scan is partition-pruned: the list filter appears as a
    // partition filter on the parquet layout, not a post-scan filter
    fromIndex.collect()
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [list_id"), plan.take(2000))
  }
}
