package graft.ops

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("stub decoder is deterministic and derives metadata from bytes") {
    val payload = Array[Byte](10, 20, 30, 40)
    val a = StubDecoder.decode(payload)
    val b = StubDecoder.decode(payload)
    assert(a == b.copy(feature = a.feature) && a.feature.sameElements(b.feature))
    assert(a.width == 26 && a.height == 36) // 16 + byte values
    assert(StubDecoder.decode(Array.empty[Byte]).width == 16)
  }

  test("decodeFeatures runs via mapPartitions and drops payload bytes") {
    val media = Seq(
      MediaRow(1L, "hello world".getBytes("UTF-8")),
      MediaRow(2L, Array.empty[Byte])
    ).toDS()
    val out = decodeFeatures(media, StubDecoder)
    assert(!out.columns.contains("payload")) // media bytes never reach downstream shuffles
    val rows = out.collect().sortBy(_.doc_id)
    assert(rows.map(_.doc_id).toSeq == Seq(1L, 2L))
    assert(rows(0).width == 16 + 'h'.toInt)
    assert(rows(0).feat_len == 11.0f)
    assert(rows(1).n_frames == 1)
  }

  test("resizeTo fits into the box aspect-preserving, never upscales") {
    // StubDecoder: width = 16+b0, height = 16+b1
    val media = Seq(
      MediaRow(1L, Array[Byte](200.toByte, 20)), // 216x36 → wide: clamp W
      MediaRow(2L, Array[Byte](20, 200.toByte)), // 36x216 → tall: clamp H
      MediaRow(3L, Array[Byte](2, 2)) // 18x18 → already fits, untouched
    ).toDS()
    val out = resizeTo(media, StubDecoder, maxW = 64, maxH = 64).collect().sortBy(_.doc_id)
    assert(out(0).out_width == 64 && out(0).out_height == 36 * 64 / 216)
    assert(out(1).out_height == 64 && out(1).out_width == 36 * 64 / 216)
    assert(out(2).out_width == 18 && out(2).out_height == 18)
    // aspect preserved within integer floor; box respected
    assert(out.forall(r => r.out_width <= 64 && r.out_height <= 64))
  }
}
