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

  test("containment catches whole-quote duplication that Jaccard misses") {
    val small = words.trim.split(" ").take(24).mkString(" ")
    // filler must be non-repeating: repeated runs collapse to the same
    // distinct chunks and artificially shrink the container's chunk set
    val filler = (1 to 60).map(i => s"filler$i").mkString(" ")
    val big = small + " " + filler.trim   // quotes `small` wholesale
    val other = "plainly unrelated content with its own vocabulary entirely here now"
    val docs = Seq((1L, small), (2L, big), (3L, other)).toDF("doc_id", "text")
    // the junction chunk (small's tail merged with filler's head)
    // legitimately differs, so containment is (k-1)/k of a handful of
    // chunks — threshold 0.5 keeps the test robust to where the
    // content hashes place that last boundary
    val pairs = Cdc
      .containmentPairs(docs, "doc_id", "text", 8, minContainmentMicro = 500000L, maxDocsPerChunk = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4))
      .toMap
    assert(pairs.contains((1L, 2L)), s"small must be contained in big: $pairs")
    assert(pairs((1L, 2L)) >= 500000L)
    assert(!pairs.contains((2L, 1L)), "the long doc is NOT contained in the short one")
    assert(!pairs.keys.exists(k => k._1 == 3L || k._2 == 3L), "unrelated doc must not pair")
    // the Jaccard the near-dup ladder would see for the same pair is low
    val smallSet = small.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val bigSet = big.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val j = smallSet.intersect(bigSet).size.toDouble / smallSet.union(bigSet).size
    assert(j < 0.5, s"the pair must sit below the near-dup threshold: $j")
  }

  test("containmentAgainstIndex flags both directions and equals the all-pairs route restricted to (new, index)") {
    val small = words.trim.split(" ").take(24).mkString(" ")
    val filler = (1 to 60).map(i => s"filler$i").mkString(" ")
    val quoter = small + " " + filler.trim        // arriving doc CONTAINS index doc 1
    val copy = small                              // arriving doc IS index doc 1
    val other = "plainly unrelated content with its own vocabulary entirely here now"
    val idxDocs = Seq((1L, small), (2L, other)).toDF("doc_id", "text")
    val arrivals = Seq((10L, quoter), (11L, copy), (12L, "fresh words nothing shared at all"))
      .toDF("doc_id", "text")
    val out = Cdc
      .containmentAgainstIndex(
        arrivals, Cdc.chunkIndex(idxDocs, "doc_id", "text", 8),
        "doc_id", "text", 8, minContainmentMicro = 500000L, maxDocsPerChunk = 8)
      .collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("idx_id")) ->
        (r.getAs[Long]("containment_new_micro"), r.getAs[Long]("containment_idx_micro")))
      .toMap
    // quoter: index doc 1 is inside it (idx direction high, new direction low)
    assert(out.contains((10L, 1L)), s"quoter must pair with its quoted index doc: $out")
    assert(out((10L, 1L))._2 >= 500000L)
    // copy: both directions complete
    assert(out((11L, 1L)) == ((1000000L, 1000000L)))
    // nothing pairs with the unrelated index doc or the fresh arrival
    assert(!out.keys.exists(k => k._2 == 2L || k._1 == 12L))
  }

  test("boilerplate chunks are capped out of pair generation") {
    // one chunk text shared by MANY docs would fan out quadratically;
    // with the cap at 3 occurrences it generates no pairs at all
    val boiler = words.trim.split(" ").take(16).mkString(" ")
    val docs = (1L to 6L).map(i => (i, boiler)).toDF("doc_id", "text")
    val pairs = Cdc
      .containmentPairs(docs, "doc_id", "text", 8, 500000L, maxDocsPerChunk = 3)
      .collect()
    assert(pairs.isEmpty, s"capped boilerplate must not pair: ${pairs.length}")
  }
}
