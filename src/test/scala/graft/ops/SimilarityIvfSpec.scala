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
}
