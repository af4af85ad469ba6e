package graft.ops

import graft.SparkSpec

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
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1: low→1 sym, low→1, newest→7 (6 chars + </w>); chars = 14
    assert(out(1L) == ((9L, 14L)))
    assert(out(2L) == ((1L, 3L)))
  }
}
