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

  test("approx tolerance report flags OK within tol and DEVIATION beyond it") {
    import org.apache.spark.sql.functions._
    val docs = Fixtures.documents(spark, "/root/testdata/sf0.001")
      .withColumn("doc_key", col("doc_id").cast("string"))
    val cols = Seq("lang", "source", "doc_key")
    val metrics = cols.map(c => s"${c}_distinct")
    val exact = CheckMigration.wideMetricsAgg(docs, Nil, cols, Nil)
    val approx = CheckMigration.wideMetricsAgg(docs, Nil, cols, Nil, approxDistinct = true)
    // the registered query's shape: every sketch within 10% → all OK,
    // and n_exact carries the portable exact counts
    val rep = CheckMigration.approxToleranceReport(approx, exact, metrics, 0.1).collect()
    assert(rep.length == metrics.size)
    assert(rep.forall(_.getAs[String]("status") == "OK"), rep.mkString("\n"))
    assert(rep.map(_.getAs[Long]("n_exact")).forall(_ > 0))
    // a sketch off by more than tolerance must flag: compare exact
    // against itself under an impossible tolerance via a shifted side
    val shifted = exact.select(metrics.map(m => (col(m) * 2).as(m)): _*)
    val bad = CheckMigration.approxToleranceReport(shifted, exact, metrics, 0.1).collect()
    assert(bad.forall(_.getAs[String]("status") == "DEVIATION"))
  }

  test("memoized dual wide stage keys by dataset - no cross-dir contamination") {
    // the deviation/summary pair shares one memoized 1-row aggregate
    // per (session, sf-dir); a wrong-key memo would silently serve one
    // dataset's metrics for another. Run both dirs interleaved, twice.
    def rowCnt(d: String): String =
      CheckMigration.metricsDeviation(spark, d)
        .filter(org.apache.spark.sql.functions.col("metric") === "row_cnt")
        .head()
        .getAs[String]("val_a")
    val a1 = rowCnt("/root/testdata/sf0.001")
    val b1 = rowCnt("/root/testdata/sf0.01")
    val a2 = rowCnt("/root/testdata/sf0.001")
    val b2 = rowCnt("/root/testdata/sf0.01")
    assert(a1 == a2 && b1 == b2)
    assert(a1 != b1, s"sf0.001 and sf0.01 lineitem row counts should differ (got $a1)")
    // the summary derives from the same memo and must agree with the
    // deviation report's OK/DEVIATION split for its dataset
    val dev = CheckMigration.metricsDeviation(spark, "/root/testdata/sf0.001")
      .groupBy("status").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sum = CheckMigration.metricsSummary(spark, "/root/testdata/sf0.001").head()
    assert(sum.getAs[Long]("n_ok") == dev.getOrElse("OK", 0L))
    assert(sum.getAs[Long]("n_deviation") == dev.getOrElse("DEVIATION", 0L))
  }

  test("skewReport ranks heavy keys, computes shares, and flags the salt threshold") {
    import spark.implicits._
    val df = (Seq.fill(8)("hot") ++ Seq("a", "b")).map(Tuple1(_)).toDF("k")
    val out = Movement
      .skewReport(df, "k", topK = 2, saltThresholdMicro = 500000L)
      .collect()
    assert(out.length == 2)
    val top = out.head
    assert(top.getAs[String]("key") == "hot")
    assert(top.getAs[Long]("n") == 8L && top.getAs[Long]("n_rows") == 10L)
    assert(top.getAs[Long]("share_micro") == 800000L)
    assert(top.getAs[Long]("salt_recommended") == 1L)
    val second = out(1)
    assert(second.getAs[String]("key") == "a", "ties break lexicographically")
    assert(second.getAs[Long]("salt_recommended") == 0L)
  }

  test("encodingAdvisor: tiny domain reads RLE, low ratio DICTIONARY, unique PLAIN") {
    import spark.implicits._
    // 2000 rows: flag has 2 values (RLE), grp has 60 values at 3% (PLAIN
    // by ratio but 60 > 50 so ratio decides: 30 per mille > 10 -> PLAIN),
    // bucket has 60 values over 12000 rows... keep it direct:
    val df = (1L to 2000L)
      .map(i => (i, if (i % 2 == 0) "y" else "n", s"g${i % 60}", s"u$i"))
      .toDF("id", "flag", "grp", "uid")
    val out = Profiling
      .encodingAdvisor(df, Seq("flag", "grp", "uid"))
      .collect()
      .map(r => r.getAs[String]("column_name") ->
        (r.getAs[Long]("n_distinct"), r.getAs[String]("advice")))
      .toMap
    assert(out("flag") == ((2L, "RLE")))
    assert(out("grp") == ((60L, "PLAIN"))) // 60 distinct / 2000 rows = 30 per mille
    assert(out("uid") == ((2000L, "PLAIN")))
    // and a genuinely dictionary-shaped column: 60 distinct over 12000 rows
    val big = (1L to 12000L).map(i => Tuple1(s"d${i % 60}")).toDF("dict")
    val adv = Profiling.encodingAdvisor(big, Seq("dict")).collect().head
    assert(adv.getAs[String]("advice") == "DICTIONARY" || adv.getAs[Long]("n_distinct") <= 50L)
  }
}
