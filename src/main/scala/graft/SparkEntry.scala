package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every operator module's registry; each
  * entry has a matching DuckDB `oracleSql` unless the operator is not
  * SQL-expressible (those are covered by ScalaTest instead).
  */
object SparkEntry {
  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (CheckMigration.queries, CheckMigration.oracles),
      (DdlGen.queries, DdlGen.oracles),
      (StarSchema.queries, StarSchema.oracles),
      (DeltaSync.queries, DeltaSync.oracles),
      (Dedup.queries, Dedup.oracles),
      (GraphDedup.queries, GraphDedup.oracles),
      (Decontamination.queries, Decontamination.oracles),
      (Paragraphs.queries, Paragraphs.oracles),
      (Spans.queries, Spans.oracles),
      (Safety.queries, Safety.oracles),
      (Mixture.queries, Mixture.oracles),
      (Cdc.queries, Cdc.oracles),
      (DataSelection.queries, DataSelection.oracles),
      (BpeTrain.queries, BpeTrain.oracles),
      (QualityClassifier.queries, QualityClassifier.oracles),
      (CorpusStats.queries, CorpusStats.oracles),
      (Packing.queries, Packing.oracles),
      (Profiling.queries, Profiling.oracles),
      (VarcharInference.queries, VarcharInference.oracles),
      (Similarity.queries, Similarity.oracles),
      (TextAnalysis.queries, TextAnalysis.oracles),
      (Chunking.queries, Chunking.oracles),
      (Centrality.queries, Centrality.oracles),
      (Search.queries, Search.oracles),
      (Layout.queries, Layout.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (Movement.queries, Movement.oracles),
      (Events.queries, Events.oracles),
      (TolerantMetrics.queries, TolerantMetrics.oracles),
      (Pipeline.queries, Pipeline.oracles),
      (graft.streaming.StreamingIngest.queries, graft.streaming.StreamingIngest.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
