package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val words =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " * 3

  test("chunks partition the document exactly, in order") {
    val docs = Seq((1L, words.trim)).toDF("doc_id", "text")
    val chunks = Cdc.cdcChunks(docs, "doc_id", "text", 8).orderBy("chunk_id").collect()
    assert(chunks.map(_.getLong(2)).sum == words.trim.split(" ").length)
    assert(chunks.map(_.getLong(1)).toSeq == chunks.indices.map(_.toLong))
  }

  test("boundaries re-synchronize after an insertion — the property fixed chunks lack") {
    val base = words.trim
    val shifted = "inserted " + base
    val docs = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val byDoc = Cdc
      .cdcChunks(docs, "doc_id", "text", 8)
      .collect()
      .groupBy(_.getLong(0))
      .view
      .mapValues(_.map(_.getString(3)).toSet)
    val shared = byDoc(1L).intersect(byDoc(2L)).size
    // only the chunk holding the insertion can differ: every other
    // boundary depends on word content alone and re-syncs immediately
    assert(shared >= byDoc(1L).size - 1, s"shared=$shared of ${byDoc(1L).size}")
    assert(shared > 0)
    // contrast: fixed 8-word windows shift EVERY chunk after the edit
    def fixedChunks(t: String) = t.split(" ").grouped(8).map(_.mkString(" ")).toSet
    val fixedShared = fixedChunks(base).intersect(fixedChunks(shifted)).size
    assert(fixedShared == 0, s"fixed chunking unexpectedly survived the shift: $fixedShared")
  }

  test("boundary decisions are positionless: same word set, same flags") {
    // the divisor test reads ONLY the word, so a chunk's digest is a
    // pure function of its text — two docs sharing a tail share its
    // chunk digests wherever that tail starts
    val tail = words.trim
    val docs = Seq((1L, "one two " + tail), (2L, "three four five six seven " + tail))
      .toDF("doc_id", "text")
    val byDoc = Cdc
      .cdcChunks(docs, "doc_id", "text", 8)
      .collect()
      .groupBy(_.getLong(0))
      .view
      .mapValues(_.map(_.getString(3)).toSet)
    assert(byDoc(1L).intersect(byDoc(2L)).size >= byDoc(1L).size - 1)
  }
}
