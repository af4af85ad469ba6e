package graft

import graft.ops.{Fixtures, Packing, Paragraphs, Relational}

/** Plan-shape regression proofs for the scan/join fundamentals: these
  * assert the physical plans keep the properties that make the
  * operators scale — filters and projections reaching the parquet
  * scan, dimension joins broadcast, top-k never globally sorting.
  */
class PlanShapeSpec extends SparkSpec {

  /** The all-registry cartesian sweep legitimately runs past the base
    * 10-minute hang guard at local[2] (planning all 339 queries builds
    * every demo index); keep the guard, just wider — a genuine hang
    * still fails this suite instead of wedging the run.
    */
  override val timeLimit: org.scalatest.time.Span =
    org.scalatest.time.Span(30, org.scalatest.time.Minutes)

  private val sfDir = "/root/testdata/sf0.001"

  test("scan_filter_project: filter and projection reach the parquet scan") {
    val df = Relational.scanFilterProject(spark, sfDir)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // predicate pushdown into the scan (not evaluated post-shuffle only)
    // (the rendered PushedFilters list is width-truncated, so match
    // the stable prefixes)
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThan(l_quantity"), plan.take(2000))
    assert(plan.contains("EqualTo(l_returnfl"), plan.take(2000))
    // column pruning: the 11-column table is scanned as only the used
    // columns — the FileScan output list must not carry l_shipdate
    val scanLine = plan.linesIterator.find(_.contains("FileScan parquet")).getOrElse("")
    assert(scanLine.contains("l_quantity") && !scanLine.contains("l_shipdate"), scanLine)
  }

  test("multimodal decode passes prune the documents scan to doc_id only") {
    // the decode family synthesizes payloads from doc_id: the text
    // column (the table's dominant bytes) must never leave the parquet
    // reader, and the projection must survive the spread() repartition
    for (
      q <- Seq(
        "multimodal_decode",
        "multimodal_mixed_decode",
        "multimodal_video_frames",
        "multimodal_pixel_stats",
        "multimodal_resize",
        "multimodal_audio_decode",
        "multimodal_audio_stats",
        "multimodal_video_decode",
        "multimodal_sniff",
        "multimodal_quarantine"
      )
    ) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      val scanLine = df.queryExecution.executedPlan.toString.linesIterator
        .find(l => l.contains("FileScan parquet") && l.contains("documents"))
        .getOrElse("")
      assert(scanLine.contains("ReadSchema: struct<doc_id:bigint>"), s"$q: $scanLine")
    }
  }

  test("media payload bytes never cross an exchange") {
    // the multimodal contract: payloads die inside their arrival
    // partition — every shuffle in a decode plan carries extracted
    // metadata only, never the payload (or any binary) column
    for (q <- Seq("multimodal_mixed_decode", "multimodal_quarantine", "multimodal_sniff")) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      val exchangeLines = df.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("Exchange"))
        .toSeq
      assert(exchangeLines.nonEmpty, s"$q: expected at least the final sort exchange")
      exchangeLines.foreach { l =>
        assert(!l.contains("payload"), s"$q shuffles payload bytes: $l")
      }
    }
  }

  test("revenue_nation: dimension joins broadcast, no cartesian products") {
    val df = Relational.revenueNation(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dims should broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("no registered data query plans a CartesianProduct") {
    // queries whose BUILDER executes heavy work (live migration, IVF
    // k-means, driver-side planners) are covered by their own gates;
    // every pure-DataFrame query must plan join strategies, never a
    // cartesian expansion (1-row query-vector crossJoins broadcast as
    // nested-loop, which is intentional and not matched here)
    val skip = Set("live_migration", "ann_ivf_lists", "parallel_read_union", "migration_plan", "partition_plan", "fk_harmonization_plan")
    SparkEntry.queries.toSeq.sortBy(_._1).filterNot(q => skip(q._1)).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cartesian in $name")
    }
  }

  test("top-k reports plan TakeOrderedAndProject, never a global sort") {
    for (q <- Seq("pmi_top_pairs", "skew_report")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"), s"$q: ${plan.take(1500)}")
    }
  }

  test("events_range_join: bucket decomposition plans a hash join, never nested-loop") {
    val df = graft.ops.Events.eventsRangeJoin(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the range predicate must ride a bucket equi-join as a residual
    // filter — a raw interval join plans BroadcastNestedLoopJoin,
    // which is quadratic in events × windows
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("limit_sample: top-k via TakeOrderedAndProject, not a global sort") {
    val df = Relational.limitSample(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("dedup_paragraph: no window, text never exchanges, no corpus-global sort") {
    // keep-earliest is a partial-aggregated min(struct) + join-back,
    // never a digest-partitioned window (a boilerplate mega-line would
    // pile one window partition); the only required exchanges move
    // (digest, doc, idx) rows — paragraph TEXT stays where it was read
    val plan = Paragraphs
      .paragraphDedup(Fixtures.documents(spark, sfDir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window found:\n${plan.take(2000)}")
    // ENSURE_REQUIREMENTS = shuffles the operators demanded; the
    // fixture loader's explicit REPARTITION_BY_NUM is upstream noise
    val exchanges = "ENSURE_REQUIREMENTS".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 required exchanges, got $exchanges:\n${plan.take(2500)}")
    assert(!plan.contains("rangepartitioning"), s"global sort found:\n${plan.take(2000)}")
    // the text column must not appear in any exchange's output
    val badLine = plan.linesIterator.find(l => l.contains("Exchange") && l.contains("para#"))
    assert(badLine.isEmpty, s"paragraph text shuffled: ${badLine.getOrElse("")}")
  }

  test("filtered paragraphs: no segmentation transform below the repartition") {
    // the doc_winnow hazard: a filter over a Generate's output used to
    // be inferred and pushed below the fixture repartition WITH the
    // whole segmentation transform inlined (split re-evaluated inside
    // the lambda) — 4-30x at sf0.1. The struct-explode shape must keep
    // every transform/slice above the exchange.
    val plan = Paragraphs
      .paragraphs(Fixtures.documents(spark, sfDir), "doc_id", "text",
        Paragraphs.Segmenter.WordChunks())
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("para")) > 3)
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
    val exchangeAt = lines.indexWhere(_.contains("Exchange"))
    assert(exchangeAt >= 0, plan.take(2000))
    val below = lines.drop(exchangeAt + 1).mkString("\n")
    assert(
      !below.contains("slice(") && !below.contains("transform("),
      s"segmentation pushed below the exchange:\n${plan.take(2500)}"
    )
  }

  test("bigram_perplexity: the model join survives with auto-broadcast disabled (no forced broadcast of the unbounded bigram relation)") {
    // a self-trained distinct-bigram model over web scale is tens of
    // GB — past any broadcast bound. The scoring and model-build joins
    // must plan as shuffled joins when broadcast is off; the only hint
    // in the query is the one-row grand total (nested-loop, bounded).
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val df = graft.ops.CorpusStats.bigramPerplexity(spark, sfDir)
      val n = df.count()
      assert(n > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert(
        plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected shuffled joins with broadcast off:\n${plan.take(2000)}"
      )
      assert(
        !plan.contains("BroadcastHashJoin"),
        s"a relation is still force-broadcast:\n${plan.take(2500)}"
      )
    } finally spark.conf.set(key, saved)
  }

  test("pack_sequences: the prefix-sum window partitions by stratum, never SinglePartition") {
    val plan = Packing.packSequencesQ(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(stratum"), plan.take(2000))
    assert(
      !plan.contains("Exchange SinglePartition"),
      s"corpus-global window found:\n${plan.take(2000)}"
    )
  }
}
