package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DeltaSyncSpec extends SparkSpec {
  import spark.implicits._

  test("merge: delta wins on match, inserts new keys, keeps unmatched target rows") {
    val target = Seq((1L, "old", 10), (2L, "keep", 20)).toDF("id", "v", "n")
    val delta = Seq((1L, "new", 11), (3L, "ins", 30)).toDF("id", "v", "n")
    val out = DeltaSync
      .merge(target, delta, Seq("id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, "new", 11), (2L, "keep", 20), (3L, "ins", 30)))
  }

  test("merge: a legitimate NULL in the delta overwrites the target value") {
    val target = Seq((1L, Some("old"))).toDF("id", "v")
    val delta = Seq((1L, None: Option[String])).toDF("id", "v")
    val out = DeltaSync.merge(target, delta, Seq("id")).collect()
    assert(out.length == 1 && out(0).isNullAt(1)) // not per-column coalesce
  }

  test("mergeIntersect: drifted source — target-only kept, source-only dropped, inserts NULL") {
    val target = Seq((1L, "old", 10), (2L, "keep", 20)).toDF("id", "v", "n")
    // source lost `n`, gained `extra`
    val delta = Seq((1L, "new", "x"), (3L, "ins", "y")).toDF("id", "v", "extra")
    val out = DeltaSync.mergeIntersect(target, delta, Seq("id"))
    // schema = target's schema exactly: no `extra`
    assert(out.columns.toSeq == Seq("id", "v", "n"))
    val rows = out
      .collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getInt(2))))
      .sortBy(_._1)
    // matched row 1: v updated from delta, target-only n kept;
    // row 2 untouched; inserted row 3: n is NULL
    assert(rows.toSeq == Seq((1L, "new", Some(10)), (2L, "keep", Some(20)), (3L, "ins", None)))
  }

  test("mergeIntersect: refuses a delta that lost a key column") {
    val target = Seq((1L, "a")).toDF("id", "v")
    val delta = Seq("b").toDF("v")
    intercept[IllegalArgumentException] {
      DeltaSync.mergeIntersect(target, delta, Seq("id"))
    }
  }

  test("applyOps: max-by-seq wins, tombstones carry, and batching order cannot change the result") {
    val ops = Seq(
      (1L, "a", 0L, 10L), (1L, "a2", 0L, 30L), (1L, "a1", 0L, 20L), // updates out of order
      (2L, "b", 0L, 11L), (2L, "b", 1L, 25L),                       // delete tombstone wins
      (3L, "c", 0L, 12L)
    ).toDF("k", "v", "is_deleted", "seq")
    val empty = ops.limit(0)
    def fold(batches: Seq[org.apache.spark.sql.DataFrame]) =
      batches
        .foldLeft(empty)((st, b) => DeltaSync.applyOps(st, b, "k", "seq", Seq("v")))
        .collect()
        .map(r => r.getAs[Long]("k") ->
          ((r.getAs[String]("v"), r.getAs[Long]("is_deleted"), r.getAs[Long]("seq"))))
        .toMap
    val oneShot = fold(Seq(ops))
    assert(oneShot(1L) == (("a2", 0L, 30L)))
    assert(oneShot(2L) == (("b", 1L, 25L)), "tombstone must be the surviving row")
    assert(oneShot(3L) == (("c", 0L, 12L)))
    // two different batchings converge to the same state (commutativity)
    val splitA = fold(Seq(ops.filter(col("seq") < 20), ops.filter(col("seq") >= 20)))
    val splitB = fold(Seq(ops.filter(col("seq") >= 20), ops.filter(col("seq") < 20)))
    assert(splitA == oneShot && splitB == oneShot)
  }

  test("snapshotDiff labels added/removed/changed/unchanged from key presence + content hash") {
    val old = Seq((1L, "same"), (2L, "before"), (3L, "gone")).toDF("doc_id", "text")
    val newer = Seq((1L, "same"), (2L, "after"), (4L, "fresh")).toDF("doc_id", "text")
    val out = DeltaSync
      .snapshotDiff(old, newer, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status"))
      .toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("deltaRows: watermark is inclusive (re-imports the boundary row)") {
    val src = Seq((1L, 10), (2L, 20), (3L, 30)).toDF("id", "ts")
    val tgt = Seq((1L, 10), (2L, 20)).toDF("id", "ts")
    val got = DeltaSync.deltaRows(src, tgt, "ts").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(2L, 3L)) // >= max(ts)=20: rows 2 and 3
  }
}
