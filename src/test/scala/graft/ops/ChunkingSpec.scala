package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocuments: hand-computed windows, stride and tail chunk") {
    // 7 tokens with window=4, stride=3 → starts 1,4,7:
    //   [t1..t4], [t4..t7], [t7] — tail chunk is the partial remainder
    val docs = Seq((1L, "a bb ccc dddd e ff g")).toDF("doc_id", "text")
    val got = Chunking
      .chunkDocuments(docs, "doc_id", "text", window = 4, stride = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "n_toks", "chunk_chars")
      .as[(Long, Long, Long, Long)]
      .collect()
      .toSeq
    // chunk texts: "a bb ccc dddd"(13), "dddd e ff g"(11), "g"(1)
    assert(got == Seq((0L, 1L, 4L, 13L), (1L, 4L, 4L, 11L), (2L, 7L, 1L, 1L)))
  }

  test("chunkDocuments: every token position is covered and overlaps equal window-stride") {
    val docs = Seq((1L, (1 to 100).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val rows = Chunking
      .chunkDocuments(docs, "doc_id", "text")
      .select("start_tok", "n_toks")
      .as[(Long, Long)]
      .collect()
      .sortBy(_._1)
    // coverage: chunk k starts where chunk k-1 still has window-stride tokens to go
    rows.sliding(2).foreach {
      case Array((s1, n1), (s2, _)) =>
        assert(s2 == s1 + Chunking.stride && s1 + n1 - 1 >= s2 - 1, s"gap between $s1 and $s2")
      case _ => ()
    }
    val covered = rows.flatMap { case (s, n) => s until (s + n) }.toSet
    assert(covered == (1 to 100).map(_.toLong).toSet)
  }

  test("fingerprint is content-addressed: identical chunk text, identical fp") {
    val docs = Seq((1L, "x y z"), (2L, "x y z")).toDF("doc_id", "text")
    val fps = Chunking
      .chunkDocuments(docs, "doc_id", "text")
      .select("chunk_fp")
      .as[Long]
      .collect()
    assert(fps.length == 2 && fps.distinct.length == 1)
  }

  test("plan shape: chunk expansion is generator-only — no exchange except the oracle sort") {
    val df = Chunking.chunkDocumentsQ(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode"), plan.take(1500))
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    // only the fixture input spread (pre-chunking) and the final
    // orderBy's range exchange; no chunk row ever hash-shuffles
    assert(
      exchanges.forall(l => l.contains("rangepartitioning") || l.contains("REPARTITION_BY_NUM")),
      exchanges.mkString("\n")
    )
  }

  test("chunkStats expansion factor is window/stride bounded") {
    val stats = Chunking.chunkStatsQ(spark, "/root/testdata/sf0.001")
      .select("expansion_micro")
      .as[Long]
      .collect()
    // expansion ∈ [1, window/stride] = [1, 1.333…] in micro-units
    assert(stats.forall(e => e >= 1000000L && e <= 1400000L), stats.mkString(","))
  }

  test("chunkStats honors textCol/langCol for frames not shaped like the fixture") {
    val docs = Seq(
      (1L, "de", "a b c d e f"),
      (2L, "de", "x y z")
    ).toDF("doc_id", "sprache", "inhalt")
    val chunks = Chunking.chunkDocuments(docs, "doc_id", "inhalt", window = 4, stride = 3)
    val got = Chunking
      .chunkStats(chunks, docs, "doc_id", textCol = "inhalt", langCol = "sprache")
      .select("lang", "n_docs", "n_chunks", "tokens", "chunk_tokens")
      .as[(String, Long, Long, Long, Long)]
      .collect()
      .toSeq
    // doc 1 (6 toks): starts 1,4 → 4+3 chunk toks; doc 2 (3 toks): start 1 → 3
    assert(got == Seq(("de", 2L, 3L, 9L, 10L)))
  }
}
