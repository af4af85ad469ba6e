package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    // 0 and 1 are near-duplicates (one word differs)
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy cat near the river bank today"),
    // 2 is an exact duplicate of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    // 3 and 4 are unrelated
    (3L, "completely different content about spark catalyst optimizer rules and physical plans"),
    (4L, "yet another unrelated document discussing parquet column pruning and predicate pushdown")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id and counts copies") {
    val out = Dedup.exactDedup(corpus, "text", "doc_id").collect()
    assert(out.length == 4) // 5 docs, one exact dup pair
    val dupRow = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dupRow.getAs[Long]("keep_id") == 0L)
  }

  test("minhash LSH finds planted near-duplicates with high jaccard") {
    val pairs = Dedup
      .lshCandidatesWithJaccard(corpus, "doc_id", "text")
      .collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")), r.getAs[Double]("jaccard")))
      .toMap
    // exact dup pair must collide on every band with jaccard 1.0
    assert(pairs.get((0L, 2L)).contains(1.0))
    // near-dup pair must be a candidate with high (but <1) jaccard
    assert(pairs.contains((0L, 1L)))
    assert(pairs((0L, 1L)) > 0.5 && pairs((0L, 1L)) < 1.0)
    // unrelated docs share no vocabulary → must NOT appear as candidates
    assert(!pairs.keys.exists { case (a, b) => Set(a, b).intersect(Set(3L, 4L)).size == 2 })
  }

  test("LSH candidate set is bucket-bounded (no all-pairs)") {
    val sh = Dedup.shingles(corpus, "doc_id", "text")
    val bands = Dedup.bandKeys(Dedup.minhashSignature(sh))
    // candidates are only pairs sharing a (band_id, band_key) bucket
    val bucketPairs = bands
      .as("a")
      .join(bands.as("b"), $"a.band_id" === $"b.band_id" && $"a.band_key" === $"b.band_key" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("da"), $"b.doc_id".as("db"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val candidates = Dedup
      .lshCandidatesWithJaccard(corpus, "doc_id", "text")
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(candidates == bucketPairs)
    val nDocs = corpus.count()
    assert(candidates.size < nDocs * (nDocs - 1) / 2) // strictly fewer than all-pairs
  }

  test("simhash: identical docs get identical fingerprints, unrelated docs differ") {
    val fps = Dedup
      .simhash(corpus, "doc_id", "text", spark)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash"))
      .toMap
    assert(fps(0L) == fps(2L))
    assert(fps(0L) != fps(3L) || fps(0L) != fps(4L))
    assert(fps.values.forall(v => v >= 0 && v < 65536))
  }
}
