package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-equivalent to the plain join on skewed data") {
    // 90% of rows pile on one key — the skew shape salting exists for
    val large = (1 to 2000)
      .map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong, s"v$i"))
      .toDF("k", "id", "payload")
    val small = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c")).toDF("sk", "dim")

    val plain = large
      .join(small, col("k") === col("sk"))
      .drop("sk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(r => (r._1, r._2))
    val salted = Salting
      .saltedJoin(large, "k", "id", small, "sk", factor = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(r => (r._1, r._2))
    assert(salted.toSeq == plain.toSeq)
  }

  test("two-sided salt grid join is row-equivalent to the plain pair join") {
    // blocked self-join shape: both sides corpus-sized, one hot block
    val docs = (1 to 300)
      .map(i => (if (i % 5 == 0) "cold" + (i % 3) else "hot", i.toLong, s"p$i"))
      .toDF("block", "doc_id", "payload")
    val a = docs.select(col("block"), col("doc_id").as("doc_a"), col("payload").as("pa"))
    val b = docs.select(col("block").as("block_b"), col("doc_id").as("doc_b"), col("payload").as("pb"))

    val plain = a
      .join(b, col("block") === col("block_b") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    val grid = Salting
      .saltedGridJoin(a, "block", "doc_a", b, "block_b", "doc_b", grid = 4)
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    assert(grid.toSeq == plain.toSeq)
    // every pair met exactly once — no duplicates from the replication
    assert(grid.distinct.length == grid.length)
  }

  test("salt spreads a hot key across the full factor range") {
    val large = (1 to 1000).map(i => (42L, i.toLong)).toDF("k", "id")
    val salts = large
      .withColumn("s", pmod(xxhash64(col("id")), lit(8)))
      .select("s")
      .distinct()
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(salts == (0L until 8L).toSet)
  }
}
