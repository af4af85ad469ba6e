package graft.ops

import graft.SparkSpec

class CheckMigrationSpec extends SparkSpec {

  test("approx-distinct scale mode stays within HLL++ error of exact") {
    val docs = Fixtures.documents(spark, "/root/testdata/sf0.001")
    val cols = Seq("lang", "source")
    val exact = CheckMigration.wideMetricsAgg(docs, Nil, cols, Nil).head()
    val approx = CheckMigration.wideMetricsAgg(docs, Nil, cols, Nil, approxDistinct = true).head()
    cols.foreach { c =>
      val e = exact.getAs[Long](s"${c}_distinct").toDouble
      val a = approx.getAs[Long](s"${c}_distinct").toDouble
      assert(e > 0)
      assert(math.abs(a - e) / e <= 0.05, s"${c}_distinct exact=$e approx=$a")
    }
    // the non-distinct metrics are identical in both modes
    assert(exact.getAs[Long]("row_cnt") == approx.getAs[Long]("row_cnt"))
    assert(exact.getAs[Long]("lang_maxlen") == approx.getAs[Long]("lang_maxlen"))
  }
}
