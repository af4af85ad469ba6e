package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI entry point for the CORPUS REFINERY: run the seven-stage
  * pipeline over a documents table and write the lake layout a real
  * training-data job leaves behind —
  *
  *   <out>/stages/<stage>/      survivor checkpoints per stage (the
  *                              restart points and audit artifacts the
  *                              pipeline's materialization contract
  *                              names)
  *   <out>/delivery/            the mixture survivors routed to
  *                              training shards (partitioned by
  *                              shard, each shard's rows in the
  *                              deterministic corpus-shuffle order)
  *   <out>/accounting/          the per-language stage accounting
  *   <out>/manifest/            per-shard doc/token counts + xor
  *                              membership digests
  *
  * Usage: runMain graft.tools.RunRefinery <sfDir> <outDir> [nShards]
  */
object RunRefinery {
  final case class Layout(stages: Map[String, Long], delivered: Long, shards: Long)

  def run(spark: SparkSession, sfDir: String, outDir: String, nShards: Int): Layout = {
    val docs = graft.ops.Fixtures.documents(spark, sfDir)
    val st = graft.ops.Pipeline.stagesFull(docs)
    val stages = Seq(
      "repetition" -> st.repKept,
      "exact" -> st.exactKept,
      "near" -> st.nearKept,
      "paragraph" -> st.paraKept,
      "span" -> st.spanKept,
      "mixture" -> st.mixKept
    )
    val counts = stages.map { case (name, df) =>
      df.select("doc_id", "lang", "text")
        .write
        .mode("overwrite")
        .parquet(s"$outDir/stages/$name")
      name -> spark.read.parquet(s"$outDir/stages/$name").count()
    }.toMap
    // delivery: shard routing + within-shard deterministic shuffle
    // order, written partitioned by shard with rows pre-sorted — a
    // reader streaming a shard's files gets a reproducible epoch
    val delivered = graft.ops.Packing
      .shardAssign(st.mixKept.select("doc_id", "lang", "text"), "doc_id", nShards)
      .withColumn(
        "draw",
        conv(
          substring(md5(concat(lit("shuf|"), col("doc_id").cast("string")).cast("binary")), 1, 12),
          16,
          10
        ).cast("long")
      )
      // shard-first sort: the parquet writer needs rows grouped by the
      // partition column and would otherwise inject its own NON-stable
      // sort on shard, destroying the draw order inside each shard
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("draw"), col("doc_id"))
    delivered.write.mode("overwrite").partitionBy("shard").parquet(s"$outDir/delivery")
    // accounting straight from the materialized stage frames — the
    // gated pipeline_full query recomputes the chain for its oracle,
    // but a DRIVER must not run the whole pipeline twice
    def perLang(df: org.apache.spark.sql.DataFrame, name: String) =
      df.groupBy(col("lang")).agg(count(lit(1)).cast("bigint").as(name))
    st.flagged
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).cast("bigint").as("n_input"),
        sum(when(col("quality_pass"), 1).otherwise(0)).cast("bigint").as("n_quality_pass")
      )
      .join(perLang(st.repKept, "n_repetition_survivors"), Seq("lang"), "left")
      .join(perLang(st.exactKept, "n_exact_survivors"), Seq("lang"), "left")
      .join(perLang(st.nearKept, "n_near_survivors"), Seq("lang"), "left")
      .join(perLang(st.paraKept, "n_paragraph_survivors"), Seq("lang"), "left")
      .join(perLang(st.spanKept, "n_span_survivors"), Seq("lang"), "left")
      .join(perLang(st.mixKept, "n_mixture_survivors"), Seq("lang"), "left")
      .na
      .fill(
        0L,
        Seq(
          "n_repetition_survivors", "n_exact_survivors", "n_near_survivors",
          "n_paragraph_survivors", "n_span_survivors", "n_mixture_survivors"
        )
      )
      .write
      .mode("overwrite")
      .parquet(s"$outDir/accounting")
    graft.ops.Packing
      .shardAssign(st.mixKept.select("doc_id", "text"), "doc_id", nShards)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("bigint"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("tokens"),
        expr("bit_xor(doc_id)").as("doc_xor")
      )
      .write
      .mode("overwrite")
      .parquet(s"$outDir/manifest")
    Layout(
      counts,
      spark.read.parquet(s"$outDir/delivery").count(),
      spark.read.parquet(s"$outDir/manifest").count()
    )
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_refinery"
    val nShards = if (args.length > 2) args(2).toInt else 8
    val spark = graft.ops.Fixtures
      .sessionBuilder(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val layout = run(spark, sfDir, outDir, nShards)
    layout.stages.toSeq.sortBy(_._1).foreach { case (n, c) => println(f"stage $n%-12s $c%8d docs") }
    println(s"delivered ${layout.delivered} docs across ${layout.shards} shards -> $outDir")
    spark.stop()
  }
}
