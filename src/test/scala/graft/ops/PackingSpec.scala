package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("contiguous packing: offsets are gapless per stratum and seq ids monotone") {
    val docs = Seq(
      (1L, "a", 300L), (2L, "a", 300L), (3L, "a", 300L), // spans at 512: doc2 crosses
      (10L, "b", 512L), (11L, "b", 1L)
    ).toDF("doc_id", "stratum", "n")
    val out = Packing
      .packSequences(docs, "doc_id", "stratum", col("n"), 512)
      .orderBy("doc_id")
      .collect()
    // stratum a: starts 0, 300, 600 -> seqs 0, 0, 1; doc2 spans 512
    assert(out(0).getAs[Long]("start_offset") == 0L && out(0).getAs[Long]("seq_id") == 0L)
    assert(out(1).getAs[Long]("start_offset") == 300L && out(1).getAs[Long]("seq_id") == 0L)
    assert(out(1).getAs[Long]("spans_boundary") == 1L)
    assert(out(2).getAs[Long]("start_offset") == 600L && out(2).getAs[Long]("seq_id") == 1L)
    // stratum b: exactly-full doc does NOT span; next starts at 512 in seq 1
    assert(out(3).getAs[Long]("spans_boundary") == 0L)
    assert(out(4).getAs[Long]("start_offset") == 512L && out(4).getAs[Long]("seq_id") == 1L)
  }

  test("packing conserves tokens: max offset + last tokens = stratum total") {
    val docs = Fixtures.documents(spark, "/root/testdata/sf0.001")
    val packed = Packing
      .packSequences(docs, "doc_id", "lang", size(split(col("text"), " ")).cast("bigint"), 512)
    val fromPack = packed
      .groupBy("stratum")
      .agg(max(col("start_offset") + col("n_tokens")).as("stream_len"))
    val direct = docs
      .select(col("lang").as("stratum"), size(split(col("text"), " ")).cast("bigint").as("n"))
      .groupBy("stratum")
      .agg(sum(col("n")).as("total"))
    val bad = fromPack.join(direct, "stratum").filter(col("stream_len") =!= col("total")).count()
    assert(bad == 0L)
  }

  test("shardAssign is deterministic, total, append-stable and roughly balanced") {
    import spark.implicits._
    val docs = (0L until 4000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = Packing.shardAssign(docs, "doc_id", 8)
    val b = Packing.shardAssign(docs, "doc_id", 8)
    // pure function of the id: identical across runs
    assert(
      a.select("doc_id", "shard").collect().toSet == b.select("doc_id", "shard").collect().toSet
    )
    // total cover, all shards in range
    assert(a.filter(col("shard") < 0 || col("shard") >= 8).count() == 0L)
    val sizes = a.groupBy(col("shard")).count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0L until 8L).toSet)
    // binomial balance: each shard within 3 sigma of 500
    assert(sizes.values.forall(n => n > 400 && n < 600), sizes.toString)
    // append-stability: a doc's shard does not depend on the rest of
    // the corpus (the df.sample failure mode)
    val partial = Packing.shardAssign(docs.filter(col("doc_id") < 100L), "doc_id", 8)
    val full100 = a.filter(col("doc_id") < 100L)
    assert(
      partial.select("doc_id", "shard").collect().toSet ==
        full100.select("doc_id", "shard").collect().toSet
    )
    // map-side projection: no exchange in the assignment plan
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shard assignment must not shuffle:\n$plan")
  }

  test("lengthBucketBatches: capacity from bucket pad, waste arithmetic exact, tokens conserved") {
    // one stratum, bucketWidth 10, maxBucket 3, budget 100.
    // bucket 0 (len < 10): docs of 5, 7, 9 → pad 9, cap 100/9 = 11 → one batch of 3
    // bucket 2 (len 20-29): docs 21, 25, 29, 24 → pad 29, cap 3 → batches [21,24,25], [29]
    val docs = Seq(
      (1L, "s", 5L), (2L, "s", 7L), (3L, "s", 9L),
      (10L, "s", 21L), (11L, "s", 25L), (12L, "s", 29L), (13L, "s", 24L)
    ).toDF("doc_id", "stratum", "toks")
    val out = Packing
      .lengthBucketBatches(docs, "doc_id", "stratum", col("toks"), 10, 3, 100)
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("batch_idx")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"), r.getAs[Long]("bucket_pad"),
          r.getAs[Long]("padded_tokens"), r.getAs[Long]("waste_micro")))
      .toMap
    assert(out((0L, 0L)) == ((3L, 21L, 9L, 27L, (27L - 21L) * 1000000L / 27L)))
    // bucket 2 ordered by doc_id: 10(21), 11(25), 12(29), 13(24) → cap 3:
    // batch 0 = docs 10,11,12 (21+25+29=75), batch 1 = doc 13 (24)
    assert(out((2L, 0L)) == ((3L, 75L, 29L, 87L, (87L - 75L) * 1000000L / 87L)))
    assert(out((2L, 1L)) == ((1L, 24L, 29L, 29L, (29L - 24L) * 1000000L / 29L)))
    // conservation: sum over batches = corpus tokens
    assert(out.values.map(_._2).sum == 5 + 7 + 9 + 21 + 25 + 29 + 24)
    // every batch respects the budget in padded cost (cap ≥ 1 guard aside)
    out.values.foreach { case (_, _, _, padded, _) => assert(padded <= 100) }
  }

  test("corpusShuffle: append-stable relative order via a range-partitioned sort") {
    import spark.implicits._
    val docs = (0L until 2000L).map(i => (i, s"d $i")).toDF("doc_id", "text")
    val order = Packing.corpusShuffle(docs, "doc_id").collect().map(_.getLong(0)).toSeq
    assert(order.sorted == (0L until 2000L))
    assert(order != (0L until 2000L), "shuffle must not be the identity order")
    // a doc's draw depends only on its id: growing the corpus cannot
    // reorder existing docs relative to each other (epoch resumability)
    val grown = Packing
      .corpusShuffle((0L until 3000L).map(i => (i, s"d $i")).toDF("doc_id", "text"), "doc_id")
      .collect()
      .map(_.getLong(0))
      .filter(_ < 2000L)
      .toSeq
    assert(grown == order)
    // the global sort is range-partitioned (sampled boundaries +
    // per-partition sorts), never a single-point merge
    val plan = Packing.corpusShuffle(docs, "doc_id").queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan.take(1500))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1500))
    // draw uniformity: eighths of the 48-bit draw space each hold
    // close to 1/8 of the corpus (binomial 5σ slack at n=2000)
    val draws = Packing.corpusShuffle(docs, "doc_id").select("draw").collect().map(_.getLong(0))
    val width = (1L << 48) / 8
    val octants = draws.groupBy(d => (d / width).min(7L)).view.mapValues(_.length).toMap
    val slack = 5 * math.sqrt(2000.0 * (1.0 / 8) * (7.0 / 8))
    (0L until 8L).foreach { o =>
      val c = octants.getOrElse(o, 0)
      assert(math.abs(c - 250.0) < slack, s"octant $o holds $c of 2000")
    }
  }
}
