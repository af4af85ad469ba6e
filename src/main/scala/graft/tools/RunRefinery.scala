package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Paragraphs.Segmenter

/** CLI entry point for the CORPUS REFINERY: run the seven-stage
  * pipeline over ANY (doc_id, lang, text) parquet corpus and write the
  * lake layout a real training-data job leaves behind —
  *
  *   <out>/stages/<stage>/      survivor checkpoints per stage (the
  *                              restart points and audit artifacts the
  *                              pipeline's materialization contract
  *                              names)
  *   <out>/delivery/            the mixture survivors routed to
  *                              training shards (partitioned by
  *                              shard, each shard's rows in the
  *                              deterministic corpus-shuffle order —
  *                              or quality-descending CURRICULUM order
  *                              with `curriculum = true`)
  *   <out>/accounting/          the per-language stage accounting
  *   <out>/manifest/            per-shard doc/token counts + xor
  *                              membership digests
  *
  * Usage:
  *   runMain graft.tools.RunRefinery <docs> <outDir> [nShards] [flags…]
  *
  * `<docs>` is either a parquet path with (doc_id, lang, text) columns
  * or a fixture sf dir (its `documents.parquet` is used). Flags:
  * `wordchunks` picks the fixed-k segmenter (fixture corpora without
  * newlines); default is blank-line paragraphs. `curriculum` orders
  * each delivery shard by quality score (descending) instead of the
  * shuffle draw.
  */
object RunRefinery {
  final case class Layout(stages: Map[String, Long], delivered: Long, shards: Long)

  /** Resolve a CLI corpus argument: a fixture sf dir (containing
    * `documents.parquet`) or a direct parquet path.
    */
  def resolveDocs(spark: SparkSession, path: String): DataFrame =
    if (new java.io.File(s"$path/documents.parquet").exists())
      graft.ops.Fixtures.documents(spark, path)
    else
      spark.read.parquet(path).select("doc_id", "lang", "text")

  def run(
      spark: SparkSession,
      docs: DataFrame,
      outDir: String,
      nShards: Int,
      seg: Segmenter = Segmenter.Delimiter(),
      curriculum: Boolean = false
  ): Layout = {
    val st = graft.ops.Pipeline.stagesFull(docs, seg = seg)
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
    // delivery: shard routing + a deterministic within-shard order —
    // the corpus-shuffle draw (reproducible epochs) or, in curriculum
    // mode, the quality score of the ORIGINAL documents (easy-first /
    // hard-last readers slice the shard by position). Both sorts lead
    // with the shard column: the parquet writer needs rows grouped by
    // the partition column and would otherwise inject its own
    // NON-stable sort on shard, destroying the in-shard order.
    val routed = graft.ops.Packing
      .shardAssign(st.mixKept.select("doc_id", "lang", "text"), "doc_id", nShards)
    val delivered =
      if (curriculum)
        routed
          .join(
            graft.ops.Pipeline.qualityScores(docs).select(col("doc_id"), col("score_micro")),
            Seq("doc_id")
          )
          .repartition(col("shard"))
          .sortWithinPartitions(col("shard"), col("score_micro").desc, col("doc_id"))
      else
        routed
          .withColumn(
            "draw",
            conv(
              substring(md5(concat(lit("shuf|"), col("doc_id").cast("string")).cast("binary")), 1, 12),
              16,
              10
            ).cast("long")
          )
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
    val docsArg = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_refinery"
    val nShards = if (args.length > 2) args(2).toInt else 8
    val flags = args.drop(3).map(_.toLowerCase).toSet
    val seg: Segmenter =
      if (flags.contains("wordchunks")) Segmenter.WordChunks() else Segmenter.Delimiter()
    val spark = graft.ops.Fixtures
      .sessionBuilder(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val layout =
      run(spark, resolveDocs(spark, docsArg), outDir, nShards, seg, flags.contains("curriculum"))
    layout.stages.toSeq.sortBy(_._1).foreach { case (n, c) => println(f"stage $n%-12s $c%8d docs") }
    println(s"delivered ${layout.delivered} docs across ${layout.shards} shards -> $outDir")
    spark.stop()
  }
}
