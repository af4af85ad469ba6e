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
}
