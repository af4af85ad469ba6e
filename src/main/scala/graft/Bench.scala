package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. Failures are reported in a separate
  * `errors` map (not folded into timings — a failed query must not
  * masquerade as a fast one).
  *
  * Denoised methodology (round 5): each query runs once cold
  * (`first_run` — comparable to the single-shot numbers of rounds
  * 1-4) and then `reps` more times; the MEDIAN of those reps is the
  * headline per-query number in `queries`. A fresh-JVM single shot
  * measures codegen/JIT/scheduler jitter as much as the query — the
  * round-4 bench showed 2-3× swings on bit-identical code — while a
  * median of warm runs measures the plan. Same pattern as
  * tools/MicroBench.scala.
  *
  * `shares_scan_with` marks queries whose number is NOT standalone:
  * they read state memoized by another query's run (the dual-wide
  * metrics cache, the IVF model memo), mirroring the reference's
  * materialize-once design. Their cost lives in the named query's
  * entry.
  *
  * `build_included` marks the self-contained index queries:
  * "first_run" = the demo index is built once per process
  * (Fixtures.demoIndexDir), so first_run carries the one-time build
  * and the median is the steady-state PROBE — the serve number that
  * matters at 100 TB; "every_run" = each run rebuilds from fresh
  * scratch dirs (the stream replay), so every rep pays build + replay.
  *
  * Output is TRUNCATION-PROOF three ways (round 5 lost its own median
  * map to a tail-capture): a compact headline line (medians only)
  * prints FIRST, the full detail line prints LAST with the median map
  * as its final fields, and the full JSON is also written to
  * bench_full.json in the repo (tracked) plus /tmp/graft_bench.json.
  * Whichever line — or line fragment — a capture keeps, the medians
  * survive.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = graft.ops.Fixtures
      .sessionBuilder(s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the session (JVM/codegen/file-listing) on the smallest SF so
    // per-query numbers measure the queries, not first-run setup.
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }

    // optional comma-separated filter for local iteration; the driver
    // never sets it, so per-round benches always cover every query
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").map(_.trim).toSet)
    val buildIncluded = Seq(
      "dedup_incremental" -> "first_run",
      "dedup_incremental_embedding" -> "first_run",
      // shares the once-per-process even-id demo index build
      "ann_hard_negatives_index" -> "first_run",
      // builds the once-per-process token-bucketed postings index
      "search_index_probe" -> "first_run",
      // builds its even/odd append+compact lifecycle demo index once
      "search_index_appended" -> "first_run",
      // shares the once-per-process postings index build
      "search_batch_index" -> "first_run",
      // shares the once-per-process postings index build (doclen+meta)
      "search_bm25_index" -> "first_run",
      // shares the once-per-process postings index build
      "search_batch_bm25" -> "first_run",
      // shares the once-per-process postings index build
      "search_disjunctive_index" -> "first_run",
      // shares the once-per-process postings index build
      "search_min_match_index" -> "first_run",
      // dictionary tier: all serve from the demo index's vocab relation
      "search_autocomplete" -> "first_run",
      "search_prefix_index" -> "first_run",
      "search_did_you_mean" -> "first_run",
      "search_fuzzy_index" -> "first_run",
      "search_wildcard_index" -> "first_run",
      // builds its own evens+odds-append (uncompacted) demo index
      "search_prefix_appended" -> "first_run",
      // shares the demo index + doc store builds
      "search_more_like_this" -> "first_run",
      // shares the once-per-process postings index build
      "search_synonym_index" -> "first_run",
      "search_boolean_not_index" -> "first_run",
      "search_proximity_index" -> "first_run",
      // builds its own base+batch0+upsert-batch1 demo index once
      "search_asof_probe" -> "first_run",
      "search_asof_bm25" -> "first_run",
      // shares that as-of demo index + builds its doc-store twin once
      "search_asof_page" -> "first_run",
      // builds the once-per-process fielded (title/body) index
      "search_bm25f" -> "first_run",
      // share the once-per-process demo index + doc store builds
      "search_facet_filtered" -> "first_run",
      "search_kwic_page_multi" -> "first_run",
      // reads the demo index's vocab relation
      "search_term_stats" -> "first_run",
      // build three shard indexes + merge them once per process
      "search_merged_probe" -> "first_run",
      "search_merged_bm25" -> "first_run",
      "search_merged_prefix" -> "first_run",
      // shares the merged index build + builds the merged store once
      "search_merged_kwic" -> "first_run",
      // analyzed dictionary tier: share the analyzed demo index build
      "search_autocomplete_analyzed" -> "first_run",
      "search_did_you_mean_analyzed" -> "first_run",
      "search_prefix_analyzed_index" -> "first_run",
      "search_fuzzy_analyzed_index" -> "first_run",
      // shares the once-per-process postings index build (its screen)
      "decontaminate_via_index" -> "first_run",
      // shares the append+compact lifecycle demo index build
      "search_phrase_index" -> "first_run",
      // builds the once-per-process ANALYZED damaged-corpus demo index
      "search_analyzed_index" -> "first_run",
      // shares the analyzed demo index build (apostings + ameta)
      "search_analyzed_bm25_index" -> "first_run",
      "search_batch_analyzed_bm25" -> "first_run",
      "search_batch_analyzed_serve" -> "first_run",
      // shares the append+compact lifecycle demo index build
      "search_phrase3_index" -> "first_run",
      // shares the analyzed demo index build (apositions)
      "search_phrase_analyzed_index" -> "first_run",
      // shares the postings-index + IVF-index demo builds
      "search_rrf_index" -> "first_run",
      "search_rrf_recall" -> "first_run",
      // shares the analyzed demo index + IVF index builds
      "search_rrf_analyzed" -> "first_run",
      // builds the once-per-process persisted cluster map (LSH + CC)
      "search_dedup_results_graph" -> "first_run",
      // shares the postings-index build + builds the bucketed doc store
      "search_kwic_page" -> "first_run",
      // share the postings-index + doc-store demo builds
      "search_facets" -> "first_run",
      "search_page_after" -> "first_run",
      // share the analyzed demo index (+ doc store) builds
      "search_facets_analyzed" -> "first_run",
      "search_page_after_analyzed" -> "first_run",
      // shares the analyzed index + builds the damaged doc store
      "search_kwic_page_analyzed" -> "first_run",
      // shares the postings-index build; the probe is footer metadata
      "search_index_stats" -> "first_run",
      // each builds its once-per-process tombstoned / purged demo index
      "search_delete_serve" -> "first_run",
      "search_delete_bm25" -> "first_run",
      "search_delete_compacted" -> "first_run",
      // builds the once-per-process two-increment persisted sketch
      "sketch_distinct_merged" -> "first_run",
      // builds the once-per-process grouped two-increment sketch
      "sketch_distinct_merged_by" -> "first_run",
      // builds the once-per-process labeled bitext bucket index
      "bitext_mine_index" -> "first_run",
      // builds the once-per-process persisted graph + rank snapshot
      "centrality_from_graph" -> "first_run",
      // shares the persisted-graph build; probes are pruned reads
      "graph_neighborhood" -> "first_run",
      // serve wholly from the shared persisted graph + snapshot
      "centrality_reps_graph" -> "first_run",
      "centrality_trustrank_graph" -> "first_run",
      // every rep rewrites the corpus source and replays the
      // micro-batched index maintenance from a fresh checkpoint
      "search_stream_probe" -> "every_run",
      // chunked-RAG twin: every rep rewrites the source and replays
      // the chunk-index maintenance from a fresh checkpoint
      "search_stream_chunk" -> "every_run",
      // fielded (BM25F) twins: every rep rewrites the fielded source
      // and replays the fpostings maintenance from a fresh checkpoint
      "search_stream_bm25f" -> "every_run",
      "search_stream_bm25f_upsert" -> "every_run",
      // analyzed twin: every rep rewrites the damaged-corpus source and
      // replays the analyzed index maintenance from a fresh checkpoint
      "search_stream_analyzed_probe" -> "every_run",
      // every rep replays the 5-batch upsert stream + compaction
      "search_stream_upsert" -> "every_run",
      // every rep seeds the even-half IVF index and replays the odd
      // half as micro-batches from a fresh checkpoint
      "ann_stream_ivf_probe" -> "every_run",
      // every rep replays the 5-batch upsert through BOTH sibling
      // streams (postings index + doc store) and compacts both
      "search_facets_stream" -> "every_run",
      // every rep replays the 4-insert + mixed-I/U/D CDC feed and
      // compacts
      "search_stream_cdc" -> "every_run",
      // every rep rewrites the JSONL scratch + damaged lines and runs
      // the quarantine + repair round
      "jsonl_repair" -> "every_run",
      "ann_ivf_topk_index" -> "first_run",
      // each builds its once-per-process tombstoned / purged IVF index
      "ann_delete_topk" -> "first_run",
      "ann_delete_compacted" -> "first_run",
      "ann_pq_knn_join" -> "first_run",
      // builds its own two-generation drifted index (build + append)
      "pq_drift_report" -> "first_run",
      // the stream replays seed their private mutable index as an FS
      // copy of the shared demo index: first_run carries the index
      // build, every rep still pays copy + full micro-batch replay
      "dedup_stream_replay" -> "first_run",
      "events_stream_replay" -> "every_run",
      "events_anomaly_stream" -> "every_run",
      // every rep rewrites the replay source and re-runs the
      // micro-batched dedup from a fresh checkpoint
      "dedup_stream_exact" -> "every_run",
      // every rep rewrites the JSONL scratch + corrupt lines
      "jsonl_ingest" -> "every_run",
      // builds "yesterday's" component map inline before the
      // increment-sized merge it exists to demonstrate
      "dedup_clusters_incremental" -> "every_run",
      "dedup_stream_clusters" -> "first_run",
      // every rep synthesizes + writes the payload corpus and replays
      // it through fresh micro-batches (scratch dirs per run)
      "multimodal_stream_decode" -> "every_run",
      // every rep rewrites the source and replays the counter stream
      "sketch_stream_topk" -> "every_run",
      // every rep rewrites the event source and replays the occupancy
      // stream from a fresh checkpoint
      "sketch_stream_distinct" -> "every_run",
      // index memoized per process; each rep replays the query
      // micro-batches against it
      "ann_pq_stream_serve" -> "first_run",
      // embedding twin of dedup_stream_replay: first_run builds the
      // demo index, every rep pays copy + micro-batch replay
      "dedup_stream_embedding" -> "first_run",
      // every rep runs the 12-round distributed merge-training loop
      // (1-row argmax per round) — training IS the query
      "bpe_merges" -> "every_run",
      // re-trains the merge table, then encodes the corpus through it
      "bpe_encode_stats" -> "every_run",
      // re-trains the merge table, then folds the dict to symbols
      "bpe_vocab" -> "every_run",
      // re-trains merges + vocab, then encodes the corpus to ids
      "bpe_encode_ids" -> "every_run",
      // every rep trains + persists the model, then replays the eval
      // split as micro-batches against the loaded artifact
      "nb_stream_scores" -> "every_run",
      // every rep persists the benchmark digests and replays the
      // corpus as micro-batches against them
      "decontaminate_stream" -> "every_run",
      // every rep persists the unigram model and replays the corpus
      // as micro-batches against it
      "perplexity_stream_scores" -> "every_run",
      // every rep persists the chunk-digest index and replays the
      // arrivals as micro-batches against it
      "cdc_containment_stream" -> "every_run",
      // every rep trains + persists the importance model, then
      // replays the corpus as micro-batches against it
      "dsir_stream_weights" -> "every_run",
      // every rep writes the CDC feed and replays it through
      // micro-batched state merges
      "delta_apply_stream" -> "every_run",
      // every rep writes both event feeds and replays the two-sided
      // join through fresh micro-batches
      "events_stream_stream_join" -> "every_run",
      // re-trains the merge table before encoding (the bpe family)
      "bpe_fertility" -> "every_run",
      // runs the full seven-stage pipeline to label each doc's
      // dropping stage (the pipeline_full shape)
      "pipeline_provenance" -> "every_run"
    )

    // `every_run` queries (stream replays) pay their FULL source
    // rewrite + fresh-checkpoint replay on every single run: a median
    // of three identical replays re-measures the same machinery at 3×
    // the wall clock (the r14 bench session hit 55 min, ~150 s of it
    // replay repetition). One cold first_run plus ONE replay rep
    // reports the same steady number; serving queries keep the full
    // rep count (their medians denoise real plan timings).
    val everyRun = buildIncluded.collect { case (n, "every_run") => n }.toSet
    val names = SparkEntry.queries.keys.toSeq.sorted.filter(n => only.forall(_.contains(n)))
    var medians = Vector.empty[(String, Double)]
    var firsts = Vector.empty[(String, Double)]
    var errors = Vector.empty[(String, String)]
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        val first = once()
        val effReps = if (everyRun(name)) math.min(1, reps) else reps
        val runs = (1 to effReps).map(_ => once()).sorted
        firsts :+= (name -> first)
        medians :+= (name -> runs(runs.length / 2))
      } catch {
        case e: Throwable =>
          errors :+= (name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    // millisecond precision keeps the line short — a long line risks
    // head-truncation in tail-style output capture
    def r3(v: Double): String = f"$v%.3f"
    def numMap(xs: Vector[(String, Double)]): String =
      xs.map { case (k, v) => s"${jstr(k)}:${r3(v)}" }.mkString("{", ",", "}")
    val qs = numMap(medians)
    val fr = numMap(firsts)
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    // queries whose timing reads another query's memoized state — the
    // named query's first_run carries the shared cost
    val sharesScanWith = Seq(
      "agg_metrics_summary" -> "agg_metrics_deviation",
      "ann_ivf_topk_index" -> "ann_ivf_lists",
      // read the PQ demo index ann_pq_knn_join built (alphabetically first)
      "pq_quality" -> "ann_pq_knn_join",
      "ann_pq_topk_index" -> "ann_pq_knn_join"
    )
    val shares = sharesScanWith
      .filter { case (k, _) => medians.exists(_._1 == k) }
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    // index queries whose timing includes building their own demo
    // index — see the object scaladoc for the first_run/every_run split
    val builds = buildIncluded
      .filter { case (k, _) => medians.exists(_._1 == k) }
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    val totalFirst = firsts.map(_._2).sum
    // headline FIRST (short: survives head-keeping captures whole),
    // detail LAST with the median map as its final fields (survives
    // tail-keeping captures) — either line alone carries the medians
    val headline =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","reps":$reps,"total_first_run":${r3(
          totalFirst
        )},"queries":$qs,"sf":"$sfDir"}"""
    val detail =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","reps":$reps,"total_first_run":${r3(
          totalFirst
        )},"first_run":$fr,"shares_scan_with":$shares,"build_included":$builds,"errors":$es,"queries":$qs,"sf":"$sfDir"}"""
    // the full JSON also lands in tracked + tmp files, so any stdout
    // truncation can always be reconstructed from the repo itself.
    // SUBSET runs (SPARK_GRAFT_QUERIES) must never touch the tracked
    // artifact: twice now a subset file was accidentally committed as
    // bench_full.json by a `git add -A` after an A/B run
    // (bench_ab_r10.md addendums 2 and 3) — only the full registry
    // writes it; subsets go to /tmp alone
    val sinks =
      if (only.isEmpty) Seq("/root/repo/bench_full.json", "/tmp/graft_bench.json")
      else Seq("/tmp/graft_bench.json")
    sinks.foreach { f =>
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(f), detail + "\n")
      catch { case _: Throwable => () }
    }
    println(headline)
    println(detail)
    spark.stop()
  }
}
