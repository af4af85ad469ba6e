package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end corpus refinery: the full delivery chain composed the
  * way a production job runs it — curate (five-stage pipeline) →
  * route (shards) → lay out (packed sequences) — with token
  * conservation asserted across every hand-off.
  */
class RefinerySpec extends SparkSpec {

  test("RunRefinery writes a consistent lake layout: stages, delivery, accounting, manifest") {
    val out = java.nio.file.Files.createTempDirectory("graft_refinery_spec").toString
    val layout = graft.tools.RunRefinery.run(spark, "/root/testdata/sf0.001", out, nShards = 4)
    // monotone stage checkpoints, delivery equals the mixture survivors
    assert(layout.stages("exact") <= layout.stages("repetition"))
    assert(layout.stages("near") <= layout.stages("exact"))
    assert(layout.stages("paragraph") <= layout.stages("near"))
    assert(layout.stages("span") <= layout.stages("paragraph"))
    assert(layout.stages("mixture") <= layout.stages("span"))
    assert(layout.delivered == layout.stages("mixture") && layout.delivered > 0)
    // accounting on disk agrees with the stage checkpoints
    val acct = spark.read.parquet(s"$out/accounting")
    assert(acct.agg(sum(col("n_span_survivors"))).head().getLong(0) == layout.stages("span"))
    assert(acct.agg(sum(col("n_mixture_survivors"))).head().getLong(0) == layout.stages("mixture"))
    // manifest covers every delivered doc exactly once
    val man = spark.read.parquet(s"$out/manifest")
    assert(man.agg(sum(col("n_docs"))).head().getLong(0) == layout.delivered)
    // delivery partition dirs carry the shard routing; each shard's
    // rows are in ascending shuffle-draw order (reproducible epochs)
    val shardDirs = new java.io.File(s"$out/delivery").listFiles().count(_.getName.startsWith("shard="))
    assert(shardDirs.toLong == layout.shards)
    val d0 = spark.read.parquet(s"$out/delivery/shard=0").select("draw").collect().map(_.getLong(0)).toSeq
    assert(d0 == d0.sorted, "within-shard delivery order must be the deterministic shuffle order")
  }

  test("curate -> shard -> pack conserves documents and tokens at every hand-off") {
    val docs = Fixtures.documents(spark, "/root/testdata/sf0.001")
    val survivors = Pipeline.stagesFull(docs).mixKept.select("doc_id", "lang", "text").cache()
    val nSurvivors = survivors.count()
    assert(nSurvivors > 0)
    // route to shards: total cover, no doc lost or duplicated
    val sharded = Packing.shardAssign(survivors, "doc_id", 8)
    assert(sharded.count() == nSurvivors)
    assert(sharded.select("doc_id").distinct().count() == nSurvivors)
    // pack within (shard) strata: every survivor placed exactly once,
    // stream length per shard equals its token total
    val packed = Packing.packSequences(
      sharded,
      "doc_id",
      "shard",
      size(split(col("text"), " ")).cast("bigint"),
      budget = 256
    )
    assert(packed.count() == nSurvivors)
    val tokensIn = sharded
      .select(size(split(col("text"), " ")).cast("bigint").as("n"))
      .agg(sum(col("n")))
      .head()
      .getLong(0)
    val tokensPacked = packed.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(tokensPacked == tokensIn)
    // offsets are dense per shard: max(start_offset + n_tokens) = total
    val perShard = packed
      .groupBy(col("stratum"))
      .agg(max(col("start_offset") + col("n_tokens")).as("stream_len"), sum(col("n_tokens")).as("tok"))
      .filter(col("stream_len") =!= col("tok"))
    assert(perShard.count() == 0L)
    survivors.unpersist()
  }
}
