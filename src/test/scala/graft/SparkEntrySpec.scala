package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: the driver grades exclusively through
  * SparkEntry, so collisions or dangling oracles must fail fast here.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("no query-name collisions across operator modules") {
    import graft.ops._
    val moduleMaps: Seq[(String, Set[String])] = Seq(
      "Relational" -> Relational.queries.keySet,
      "CheckMigration" -> CheckMigration.queries.keySet,
      "DdlGen" -> DdlGen.queries.keySet,
      "StarSchema" -> StarSchema.queries.keySet,
      "DeltaSync" -> DeltaSync.queries.keySet,
      "Dedup" -> Dedup.queries.keySet,
      "GraphDedup" -> GraphDedup.queries.keySet,
      "Decontamination" -> Decontamination.queries.keySet,
      "Paragraphs" -> Paragraphs.queries.keySet,
      "Spans" -> Spans.queries.keySet,
      "Safety" -> Safety.queries.keySet,
      "Mixture" -> Mixture.queries.keySet,
      "Cdc" -> Cdc.queries.keySet,
      "DataSelection" -> DataSelection.queries.keySet,
      "BpeTrain" -> BpeTrain.queries.keySet,
      "QualityClassifier" -> QualityClassifier.queries.keySet,
      "CorpusStats" -> CorpusStats.queries.keySet,
      "Packing" -> Packing.queries.keySet,
      "Profiling" -> Profiling.queries.keySet,
      "VarcharInference" -> VarcharInference.queries.keySet,
      "Similarity" -> Similarity.queries.keySet,
      "TextAnalysis" -> TextAnalysis.queries.keySet,
      "Chunking" -> Chunking.queries.keySet,
      "Centrality" -> Centrality.queries.keySet,
      "Search" -> Search.queries.keySet,
      "Layout" -> Layout.queries.keySet,
      "Multimodal" -> Multimodal.queries.keySet,
      "Movement" -> Movement.queries.keySet,
      "Events" -> Events.queries.keySet,
      "TolerantMetrics" -> TolerantMetrics.queries.keySet,
      "Pipeline" -> Pipeline.queries.keySet,
      "StreamingIngest" -> graft.streaming.StreamingIngest.queries.keySet
    )
    val all = moduleMaps.flatMap { case (m, ks) => ks.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(SparkEntry.queries.size == all.size, "SparkEntry lost or gained entries vs modules")
  }

  test("every oracle refers to a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("oracle coverage is total — every registered query has an oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracles: $noOracle")
  }
}
