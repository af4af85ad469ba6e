package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-governance operators: PII scan/redaction semantics, source
  * blocklist, and duplicated-span detection.
  */
class SafetySpansSpec extends SparkSpec {
  import spark.implicits._

  test("piiSignals counts every pattern family and redacts all occurrences") {
    val d = Seq(
      (1L, "write to alice@mail.example.com or bob@ex.io from 10.0.42.1 call 555-0111 ok"),
      (2L, "clean text with no contact details at all")
    ).toDF("doc_id", "text")
    val out = Safety.piiSignals(d, "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_emails") == 2L)
    assert(out(0).getAs[Long]("n_ips") == 1L)
    assert(out(0).getAs[Long]("n_phones") == 1L)
    assert(out(0).getAs[Long]("has_pii") == 1L)
    assert(
      out(0).getAs[String]("redacted") ==
        "write to <EMAIL> or <EMAIL> from <IP> call <PHONE> ok"
    )
    assert(out(1).getAs[Long]("has_pii") == 0L)
    assert(out(1).getAs[String]("redacted") == "clean text with no contact details at all")
  }

  test("pii scan is a stateless single pass — no exchange in the plan") {
    val d = Seq((1L, "x")).toDF("doc_id", "text")
    val plan = Safety.piiSignals(d, "doc_id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PII scan must not shuffle:\n$plan")
  }

  test("normalizeText lowercases, strips punctuation and collapses whitespace") {
    val d = Seq(
      (1L, "  Hello,   WORLD!!  it's 2024...  "),
      (2L, "already clean text"),
      (3L, "!!!???")
    ).toDF("doc_id", "text")
    val out = d
      .select(col("doc_id"), TextAnalysis.normalizeText(col("text")).as("n"))
      .orderBy("doc_id")
      .collect()
      .map(_.getString(1))
    assert(out(0) == "hello world it s 2024")
    assert(out(1) == "already clean text")
    assert(out(2) == "")
  }

  test("holdoutSplit is append-stable and covers every doc exactly once") {
    import spark.implicits._
    val docs = (0L until 5000L).map(i => (i, s"t $i")).toDF("doc_id", "text")
    val full = Mixture.holdoutSplit(docs, "doc_id")
    assert(full.count() == 5000L)
    val sizes = full.groupBy(col("split")).count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set("train", "val", "test"))
    // 98/1/1 within binomial slack
    assert(sizes("train") > 4800 && sizes("val") < 150 && sizes("test") < 150, sizes.toString)
    // a doc's split never depends on the rest of the corpus
    val partial = Mixture.holdoutSplit(docs.filter(col("doc_id") < 500L), "doc_id")
    assert(
      partial.select("doc_id", "split").collect().toSet ==
        full.filter(col("doc_id") < 500L).select("doc_id", "split").collect().toSet
    )
    // map-side: no exchange
    assert(!full.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("sourceBlocklist flags exactly the listed sources") {
    val d = Seq((1L, "a b", "good"), (2L, "c d", "bad"), (3L, "e", "good"))
      .toDF("doc_id", "text", "source")
    val out = Safety
      .sourceBlocklist(d, "source", Seq("bad"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("blocked"))
      .toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("spanDigests: overlapping windows, short docs empty, duplicates found corpus-wide") {
    val span = (1 to 20).map(i => s"s$i").mkString(" ")
    val d = Seq(
      (1L, s"$span tail1 tail2"), // 3 spans, the first duplicated in doc 2
      (2L, s"lead $span"),        // 2 spans
      (3L, "too short to produce any span at all")
    ).toDF("doc_id", "text")
    val digs = Spans.spanDigests(d, "doc_id", "text")
    assert(digs.filter(col("doc_id") === 1L).count() == 3L)
    assert(digs.filter(col("doc_id") === 2L).count() == 2L)
    assert(digs.filter(col("doc_id") === 3L).count() == 0L)
    // the shared 20-word run digests identically from both docs
    val shared = digs.groupBy(col("dig")).count().filter(col("count") >= 2)
    assert(shared.count() == 1L)
    val out = Spans
      .substringDupSpans(spark, "/root/testdata/sf0.001")
    assert(out.filter(col("n_dup_spans") > col("n_spans")).count() == 0L)
  }

  test("a boilerplate mega-span shared by thousands of docs counts correctly") {
    // the skew case the groupBy+join shape exists for: one 20-word
    // span repeated across 3000 docs plus a unique tail per doc
    val span = (1 to 20).map(i => s"bp$i").mkString(" ")
    val docs = spark
      .range(0L, 3000L)
      .selectExpr("id AS doc_id", s"concat('u', id, ' ', '$span') AS text")
    val digs = Spans.spanDigests(docs.toDF(), "doc_id", "text")
    val occ = digs.groupBy(col("dig")).count()
    // every doc yields 2 spans (pos 0 with its unique head, pos 1 the
    // pure boilerplate); the boilerplate digest occurs 3000 times
    assert(occ.filter(col("count") === 3000L).count() == 1L)
    assert(digs.count() == 6000L)
  }

  test("spanRemoval cuts every occurrence, merges overlaps, round-trips clean docs") {
    val span = (1 to 20).map(i => s"s$i").mkString(" ")
    val d = Seq(
      (1L, s"head1 head2 $span tail1 tail2"), // span in the middle
      (2L, span),                             // the whole doc is the span
      (3L, "a totally unique document with no duplicated spans inside"),
      (4L, s"$span $span x")                  // overlapping flagged chain (spans at 0..20 all flagged)
    ).toDF("doc_id", "text")
    val out = Spans
      .spanRemoval(d, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
    // doc 1: only pos 2 is flagged (heads/tails make the other windows
    // unique) — the 20 covered words go, the surroundings survive
    assert(out(0).getAs[String]("clean_text") == "head1 head2 tail1 tail2")
    assert(out(0).getAs[Long]("n_words_removed") == 20L)
    // doc 2: everything cut
    assert(out(1).getAs[String]("clean_text") == "")
    assert(out(1).getAs[Long]("n_words_removed") == 20L)
    // doc 3: untouched, byte-identical to the source
    assert(out(2).getAs[String]("clean_text") == "a totally unique document with no duplicated spans inside")
    assert(out(2).getAs[Long]("n_words_removed") == 0L)
    assert(out(2).getAs[Long]("chars_removed") == 0L)
    // doc 4: 41 words, flagged spans overlap into ONE merged interval
    // covering word 0..39 (every window within the doubled span region
    // also appears in docs 1/2 or repeats) — only the unique tail stays
    assert(out(3).getAs[String]("clean_text") == "x")
    assert(out(3).getAs[Long]("n_words") == 41L)
  }

  test("spanRemoval conserves characters and words corpus-wide") {
    val span = (1 to 20).map(i => s"c$i").mkString(" ")
    val docs = spark
      .range(0L, 400L)
      .selectExpr(
        "id AS doc_id",
        // every even doc carries the boilerplate span plus a unique tail;
        // odd docs are unique filler long enough to produce spans
        s"CASE WHEN id % 2 = 0 THEN concat('$span', ' u', id, ' v', id) " +
          s"ELSE concat('w', id, ' ', repeat(concat('f', id, ' '), 25), 'z', id) END AS text"
      )
      .toDF()
    val out = Spans.spanRemoval(docs, "doc_id", "text")
    val joined = docs.join(out, "doc_id")
    // character conservation, measured against the source text for
    // EVERY document: |text| == |clean_text| + chars_removed
    assert(
      joined.filter(length(col("text")) =!= length(col("clean_text")) + col("chars_removed")).count() == 0L,
      "chars_removed must account exactly for the cut characters"
    )
    assert(joined.filter(size(split(col("text"), " ")) =!= col("n_words")).count() == 0L)
    // even docs lose exactly the 20-word boilerplate, keeping the tail
    joined.filter(col("doc_id") % 2 === 0).select("doc_id", "clean_text", "n_words_removed").collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("clean_text") == s"u$id v$id", s"doc $id: ${r.getAs[String]("clean_text")}")
      assert(r.getAs[Long]("n_words_removed") == 20L)
    }
    // odd docs' repeated filler is a WITHIN-doc duplicated span (six
    // identical all-filler windows merge into one interval) — only the
    // unique head and tail words survive
    joined.filter(col("doc_id") % 2 === 1).select("doc_id", "clean_text", "n_words_removed").collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("clean_text") == s"w$id z$id", s"doc $id: ${r.getAs[String]("clean_text")}")
      assert(r.getAs[Long]("n_words_removed") == 25L)
    }
  }

  test("spanRemoval matches a brute-force covered-set reference on random corpora") {
    import spark.implicits._
    // reference: flag every k-window whose text occurs >= 2 times
    // corpus-wide, cover flagged word indices, keep the complement —
    // the SEMANTICS, with none of the engine's interval machinery
    def reference(docs: Seq[(Long, String)], k: Int): Map[Long, (String, Long, Long)] = {
      val counts = docs
        .flatMap { case (_, t) =>
          val w = t.split(" ", -1)
          (0 to w.length - k).map(p => w.slice(p, p + k).mkString(" "))
        }
        .groupBy(identity)
        .view
        .mapValues(_.size)
        .toMap
      docs.map { case (id, t) =>
        val w = t.split(" ", -1)
        val covered = (0 to w.length - k)
          .filter(p => counts(w.slice(p, p + k).mkString(" ")) >= 2)
          .flatMap(p => p until p + k)
          .toSet
        val kept = w.indices.filterNot(covered).map(w)
        val clean = kept.mkString(" ")
        (id, (clean, (w.length - kept.size).toLong, (t.length - clean.length).toLong))
      }.toMap
    }
    for (seed <- Seq(11, 47, 83)) {
      val rnd = new scala.util.Random(seed)
      // tiny vocabulary + short docs so duplicated 5-grams actually
      // occur, including overlapping and within-doc repeats
      val corpus = (0L until 30L).map { id =>
        val n = 5 + rnd.nextInt(25)
        (id, Seq.fill(n)(s"w${rnd.nextInt(4)}").mkString(" "))
      }
      val expected = reference(corpus, 5)
      val got = Spans
        .spanRemoval(corpus.toDF("doc_id", "text"), "doc_id", "text", spanWords = 5)
        .collect()
        .map(r =>
          r.getAs[Long]("doc_id") ->
            ((r.getAs[String]("clean_text"), r.getAs[Long]("n_words_removed"), r.getAs[Long]("chars_removed")))
        )
        .toMap
      assert(got == expected, s"seed $seed")
    }
  }

  test("spanRemovalToFixedPoint converges on crafted cut-boundary adjacencies single-pass misses") {
    import spark.implicits._
    // Doc A self-repeats 5 Ms: the three "M M M" windows flag the run,
    // pass 1 splices "p q | r s t" together. Only THEN does A contain
    // the window "p q r" — which doc C carried all along. Pass 2 cuts
    // it from both. No pass-1 window of A or C is shared (pinned below).
    val docs = Seq(
      (1L, "p q M M M M M r s t"),
      (2L, "z1 z2 p q r z3 z4")
    ).toDF("doc_id", "text")
    // single-pass semantics: the Ms go, the cross-boundary "p q r"
    // duplication is created and left in place
    val single = Spans
      .spanRemoval(docs, "doc_id", "text", spanWords = 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text"))
      .toMap
    assert(single(1L) == "p q r s t" && single(2L) == "z1 z2 p q r z3 z4")
    val res = Spans.spanRemovalToFixedPoint(docs, "doc_id", "text", spanWords = 3, maxPasses = 5)
    assert(res.converged, "crafted corpus must reach the fixed point")
    assert(res.passes.map(p => (p.pass, p.docs_cut, p.words_removed)) == Seq((1, 1L, 5L), (2, 2L, 6L)))
    val fin = res.cleaned
      .collect()
      .map(r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("clean_text"), r.getAs[Long]("n_words_removed"), r.getAs[Long]("n_words")))
      )
      .toMap
    // accounting is vs the ORIGINAL text across all passes
    assert(fin(1L) == (("s t", 8L, 10L)))
    assert(fin(2L) == (("z1 z2 z3 z4", 3L, 7L)))
    // a clean corpus converges in zero passes and is returned intact
    val clean = Seq((9L, "all these words occur exactly once here")).toDF("doc_id", "text")
    val noop = Spans.spanRemovalToFixedPoint(clean, "doc_id", "text", spanWords = 3, maxPasses = 2)
    assert(noop.converged && noop.passes.isEmpty)
    assert(noop.cleaned.head().getAs[String]("clean_text") == "all these words occur exactly once here")
    // maxPasses caps the loop and reports non-convergence honestly
    val capped = Spans.spanRemovalToFixedPoint(docs, "doc_id", "text", spanWords = 3, maxPasses = 1)
    assert(!capped.converged && capped.passes.size == 1)
    val cappedA = capped.cleaned.filter(col("doc_id") === 1L).head()
    assert(cappedA.getAs[String]("clean_text") == "p q r s t")
  }

  test("stagesFull spanPasses option iterates stage 6 without changing the default") {
    import spark.implicits._
    // survivors of stages 1-5 are the same corpus both ways; only the
    // span stage differs. Crafted docs pass quality (>= 20 tokens,
    // stopword ratio in band) and share nothing at the doc level.
    def pad(tag: String) =
      s"the $tag one and a $tag two of $tag three in $tag four to $tag five $tag six $tag seven"
    val docs = Seq(
      (1L, s"${pad("aa")} p q M M M M M r s t", "en", "s", 0L),
      (2L, s"${pad("bb")} z1 z2 p q r z3 z4", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val one = Pipeline.stagesFull(docs, seg = Paragraphs.Segmenter.WordChunks())
    val fp = Pipeline.stagesFull(docs, seg = Paragraphs.Segmenter.WordChunks(), spanPasses = 5)
    // k=20 spans: neither corpus has 20-word duplicated windows, so
    // both routes keep both docs — the option is a pass-through here
    assert(one.spanKept.count() == 2L && fp.spanKept.count() == 2L)
  }

  test("spanRemoval plans no window and no quadratic fold") {
    val plan = Spans
      .spanRemovalQ(spark, "/root/testdata/sf0.001")
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("Window"), s"span removal must not plan a window:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("contaminationSpanRemoval: benchmark digests broadcast, no window") {
    // parquet-backed sides (a toy LocalRelation lets AQE fold the
    // whole query away before the join shape is observable)
    val docs = Fixtures.documents(spark, "/root/testdata/sf0.001")
    val df = Spans.contaminationSpanRemoval(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0),
      "doc_id",
      "text",
      n = 3
    )
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    // the flag join rides a broadcast of the benchmark digest set —
    // the training windows are never shuffled for flagging
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(plan).isDefined, plan.take(2500))
  }

  test("sourceQualityReport blocks exactly the sources whose integer mean dips under the bar") {
    val scored = Seq(
      (1L, "good", 3000000L),
      (2L, "good", 3000001L),  // mean 3000000 (floor) — kept at bar 3000000
      (3L, "bad", 2999999L),
      (4L, "bad", 3000000L),   // mean 2999999 (floor) — blocked
      (5L, "edge", 2999999L)   // single doc under the bar — blocked
    ).toDF("doc_id", "source", "score_micro")
    val out = Safety
      .sourceQualityReport(scored, "source", minAvgScore = 3000000L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("good") == ((2L, 3000000L, 0L)))
    assert(out("bad") == ((2L, 2999999L, 1L)))
    assert(out("edge") == ((1L, 2999999L, 1L)))
  }


  test("gopher structural rules fire on crafted violations") {
    val base = (1 to 60).map(i => s"word$i").mkString(" ") + " the of and that"
    val rows = Seq(
      (1L, "en", "s1", base),                                          // clean: passes
      (2L, "en", "s1", base + " ### ### ### ### ### ### ### ###"),    // symbol ratio > 0.1
      (3L, "en", "s1", (1 to 60).map(_ => "xxxxxxxxxxxx").mkString(" ") + " the of and that"), // mean word len > 10
      (4L, "en", "s1", (1 to 30).map(i => s"- bullet item $i").mkString("\n") + "\nthe of and that"), // bullets
      (5L, "en", "s1", "too short the of and that")                    // word count < 50
    ).toDF("doc_id", "lang", "source", "text")
    // drive through the same expressions the gated query uses, minus
    // the fixture planting (crafted docs carry their own stops)
    import org.apache.spark.sql.functions._
    val out = rows
      .withColumn("w", split(col("text"), " "))
      .withColumn("lines", split(col("text"), "\n"))
      .withColumn("n_words", size(col("w")).cast("bigint"))
      .withColumn("n_lines", size(col("lines")).cast("bigint"))
      .withColumn("mean_word_len_micro", expr("aggregate(w, 0L, (acc, x) -> acc + length(x)) * 1000000 div n_words"))
      .withColumn("symbol_ratio_micro", expr("(regexp_count(text, '#') + regexp_count(text, '\\\\.\\\\.\\\\.')) * 1000000 div n_words"))
      .withColumn("bullet_line_micro", expr("size(filter(lines, x -> x rlike '^\\\\s*[-*•]')) * 1000000 div n_lines"))
      .withColumn("ok",
        (col("n_words") >= 50 && col("mean_word_len_micro") <= 10000000L &&
          col("symbol_ratio_micro") <= 100000L && col("bullet_line_micro") < 900000L).cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(r.fieldIndex("ok"))).toMap
    assert(out(1L) == 1, s"clean doc must pass: $out")
    assert(out(2L) == 0, "symbol-heavy doc must fail")
    assert(out(3L) == 0, "unnaturally long words must fail")
    assert(out(4L) == 0, "bullet-dominated doc must fail")
    assert(out(5L) == 0, "short doc must fail")
  }

  test("stripMarkup drops script/style content, breaks words at tags, unescapes amp last") {
    val rows = Seq(
      (1L, "<p>hello</p><p>world</p>"),                       // tags are word breaks
      (2L, "<script>var hidden = 'secret';</script>visible"), // script CONTENT dropped
      (3L, "<style>p { color: red }</style>styled"),
      (4L, "a &amp;lt; b &amp; c &lt; d"),                    // amp-last: &amp;lt; -> &lt;, never <
      (5L, "no markup at all")
    ).toDF("doc_id", "text")
    val out = rows
      .select(col("doc_id"), TextAnalysis.stripMarkup(col("text")).as("t"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(out(1L) == "hello world", out(1L))
    assert(out(2L) == "visible" && !out(2L).contains("secret"))
    assert(out(3L) == "styled")
    assert(out(4L) == "a &lt; b & c < d", out(4L))
    assert(out(5L) == "no markup at all")
  }

  test("winnowPairs: exact copies overlap 10^6, paragraph REORDERING still pairs, unrelated does not") {
    val paraA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val paraB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val docs = Seq(
      (1L, paraA + " " + paraB),
      (2L, paraA + " " + paraB),           // exact copy of 1
      (3L, paraB + " " + paraA),           // same paragraphs, reordered
      (4L, (1 to 60).map(i => s"gamma$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextAnalysis
      .winnowPairs(docs, minOverlapMicro = 500000L, maxDocsPerFp = 8)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Long]("overlap_micro"))
      .toMap
    assert(out((1L, 2L)) == 1000000L, s"exact copies must fully overlap: $out")
    // the reordered doc shares every selection except those from the
    // junction windows — well above the 0.5 bar, which is the property
    // order-sensitive span digests lack
    assert(out.contains((1L, 3L)) && out((1L, 3L)) >= 500000L, s"reordering must still pair: $out")
    assert(!out.keys.exists(k => k._1 == 4L || k._2 == 4L), "unrelated doc must not pair")
  }

  test("langIdConfusion cells sum to the per-language doc counts of the accuracy table") {
    val d = "/root/testdata/sf0.001"
    val cells = TextAnalysis.langIdConfusion(spark, d).collect()
    val perLang = cells
      .groupBy(_.getAs[String]("lang"))
      .map { case (l, g) => l -> g.map(_.getAs[Long]("n_docs")).sum }
    val acc = TextAnalysis
      .langIdHeuristic(spark, d)
      .collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_docs"))
      .toMap
    assert(perLang == acc)
    // predictions are only ever 'en' or 'unknown'
    assert(cells.map(_.getAs[String]("pred")).toSet.subsetOf(Set("en", "unknown")))
  }

  test("substringDupSpans plans no window — occurrence counts are aggregate + join") {
    val plan = Spans
      .substringDupSpans(spark, "/root/testdata/sf0.001")
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("Window"), s"span counting must not plan a window:\n${plan.take(2000)}")
  }
}
