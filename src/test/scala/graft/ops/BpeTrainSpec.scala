package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("learns the paper's textbook merges in order") {
    // Sennrich et al. 2016 §3.2 example dict: low×5, lower×2,
    // newest×6, widest×3 — first merges are (e,s,9), (es,t,9),
    // (est,</w>,9), then (l,o,7) on the tie with (o,w) by left ASC
    val corpus = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
      (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    ).toDF("doc_id", "text")
    val merges = BpeTrain
      .learnMerges(corpus, "text", numMerges = 4)
      .orderBy("rank")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(
      merges == Seq(
        (1L, "e", "s", 9L),
        (2L, "es", "t", 9L),
        (3L, "est", "</w>", 9L),
        (4L, "l", "o", 7L)
      ),
      merges.toString
    )
  }

  test("pair counting is overlap-inclusive, merging is greedy non-overlapping") {
    // "aaaa" has THREE (a,a) pair occurrences (the paper's get_stats
    // counts overlaps) but a merge pass produces [aa, aa, </w>]
    val corpus = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val m = BpeTrain.learnMerges(corpus, "text", 1).collect().head
    assert((m.getString(1), m.getString(2), m.getLong(3)) == (("a", "a", 6L)))
    // greedy pass inside the encoder: odd run leaves the tail single
    assert(BpeTrain.encodeLen("aaa", Map(("a", "a") -> 1L)) == 3) // [aa, a, </w>]
    assert(BpeTrain.encodeLen("aaaa", Map(("a", "a") -> 1L)) == 3) // [aa, aa, </w>]
  }

  test("encoder applies merges by rank and compresses learned words") {
    val ranks = Map(
      ("e", "s") -> 1L,
      ("es", "t") -> 2L,
      ("est", "</w>") -> 3L,
      ("l", "o") -> 4L,
      ("lo", "w") -> 5L
    )
    assert(BpeTrain.encodeLen("newest", ranks) == 4) // n e w est</w>
    assert(BpeTrain.encodeLen("low", ranks) == 2)    // low </w>
    assert(BpeTrain.encodeLen("xyz", ranks) == 4)    // untouched: chars + </w>
  }

  test("training is deterministic and invariant to corpus partitioning") {
    val docs = Fixtures.documents(spark, "/root/testdata/sf0.001")
    val a = BpeTrain.learnMerges(docs, "text", 6).collect().map(_.toSeq).toSeq
    val b = BpeTrain.learnMerges(docs.repartition(13), "text", 6).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.size == 6)
  }

  test("minFreq stops training early") {
    val corpus = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // (a,b)=2 then (ab,</w>)=2 pass minFreq=2; every remaining pair
    // is the cd word's freq-1 pairs, so training stops at rank 2 of 10
    val m = BpeTrain.learnMerges(corpus, "text", 10, minFreq = 2L)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m == Seq(("a", "b", 2L), ("ab", "</w>", 2L)), m.toString)
  }

  test("encode stats count every word through the partition-local cache") {
    val corpus = Seq((1L, "en", "low low newest"), (2L, "de", "low")).toDF("doc_id", "lang", "text")
    val merges = Seq((1L, "l", "o", 9L), (2L, "lo", "w", 9L), (3L, "low", "</w>", 9L))
      .toDF("rank", "left", "right", "pair_freq")
    val out = BpeTrain
      .encodeStats(corpus, merges)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // doc 1: low→1 sym, low→1, newest→7 (6 chars + </w>); chars = 14; 3 words
    assert(out(1L) == ((9L, 14L, 3L)))
    assert(out(2L) == ((1L, 3L, 1L)))
  }

  test("encodeIds: ids are sorted-vocab ranks and the rolling checksum is order-sensitive") {
    val corpus = Seq((1L, "en", "ab ba"), (2L, "en", "ba ab")).toDF("doc_id", "lang", "text")
    // no merges: symbols are chars + </w>; vocab of the trained dict
    val merges = spark.emptyDataFrame
      .sparkSession.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        new org.apache.spark.sql.types.StructType()
          .add("rank", "long").add("left", "string").add("right", "string").add("pair_freq", "long"))
    val vocab = Seq(("a", 4L), ("b", 4L), ("</w>", 4L)).toDF("symbol", "n_occurrences")
    val out = BpeTrain
      .encodeIds(corpus, merges, vocab)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_ids"), r.getAs[Long]("seq_hash"))))
      .toMap
    // sorted vocab: </w> -> 0, a -> 1, b -> 2
    val mask = (1L << 61) - 1
    def roll(ids: Seq[Long]): Long = ids.foldLeft(0L)((h, i) => (h * 1000003L + i + 1L) & mask)
    val hash1 = roll(Seq(1L, 2L, 0L, 2L, 1L, 0L)) // "ab" -> a b </w>, "ba" -> b a </w>
    val hash2 = roll(Seq(2L, 1L, 0L, 1L, 2L, 0L))
    assert(out(1L) == ((6L, hash1)))
    assert(out(2L) == ((6L, hash2)))
    assert(hash1 != hash2, "a transposition must flip the checksum")
  }

  test("encodeIds: OOV symbols take sentinel id |vocab| and still perturb the checksum") {
    // vocab covers only a/b/</w>; 'z' is foreign. Sentinel = 3 (one
    // past the largest rank), so a leading OOV run must NOT leave the
    // rolling hash at 0 and OOV placement must be checksum-visible.
    val corpus = Seq((1L, "xx", "zz ab"), (2L, "xx", "ab zz")).toDF("doc_id", "lang", "text")
    val merges = spark.emptyDataFrame
      .sparkSession.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        new org.apache.spark.sql.types.StructType()
          .add("rank", "long").add("left", "string").add("right", "string").add("pair_freq", "long"))
    val vocab = Seq(("a", 4L), ("b", 4L), ("</w>", 4L)).toDF("symbol", "n_occurrences")
    val out = BpeTrain
      .encodeIds(corpus, merges, vocab)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_ids"), r.getAs[Long]("seq_hash"))))
      .toMap
    val mask = (1L << 61) - 1
    def roll(ids: Seq[Long]): Long = ids.foldLeft(0L)((h, i) => (h * 1000003L + i + 1L) & mask)
    // sorted vocab: </w> -> 0, a -> 1, b -> 2; OOV z -> 3
    val h1 = roll(Seq(3L, 3L, 0L, 1L, 2L, 0L)) // "zz" -> z z </w>, "ab" -> a b </w>
    val h2 = roll(Seq(1L, 2L, 0L, 3L, 3L, 0L))
    assert(out(1L) == ((6L, h1)))
    assert(out(2L) == ((6L, h2)))
    assert(h1 != h2, "OOV position must be checksum-visible")
    assert(h1 != roll(Seq(1L, 2L, 0L)), "leading OOV run must not be a hash no-op")
  }

  test("fertility micro-units follow from the encode totals exactly") {
    val corpus = Seq((1L, "en", "low low newest"), (2L, "en", "low")).toDF("doc_id", "lang", "text")
    val merges = Seq((1L, "l", "o", 9L), (2L, "lo", "w", 9L), (3L, "low", "</w>", 9L))
      .toDF("rank", "left", "right", "pair_freq")
    val agg = BpeTrain
      .encodeStats(corpus, merges)
      .groupBy("lang")
      .agg(
        sum(col("n_words")).cast("bigint").as("n_words"),
        sum(col("n_bpe_tokens")).cast("bigint").as("total_bpe_tokens"),
        sum(col("n_chars")).cast("bigint").as("total_chars")
      )
      .withColumn("fertility_micro", expr("total_bpe_tokens * 1000000 div n_words"))
      .withColumn("chars_per_token_micro", expr("total_chars * 1000000 div total_bpe_tokens"))
      .collect()
    assert(agg.length == 1)
    val r = agg.head
    // tokens: 1+1+7 + 1 = 10 over 4 words → 2.5 tokens/word;
    // chars: 14 + 3 = 17 over 10 tokens → 1.7 chars/token
    assert(r.getAs[Long]("n_words") == 4L)
    assert(r.getAs[Long]("total_bpe_tokens") == 10L)
    assert(r.getAs[Long]("fertility_micro") == 2500000L)
    assert(r.getAs[Long]("chars_per_token_micro") == 1700000L)
  }
}
