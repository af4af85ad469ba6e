package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ParagraphsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("paragraphs: 10-word chunking preserves order and every word") {
    val d = docs((1L, (1 to 25).map(i => s"w$i").mkString(" ")))
    val p = Paragraphs.paragraphs(d, "doc_id", "text").orderBy("para_idx").collect()
    assert(p.length == 3)
    assert(p(0).getString(2) == (1 to 10).map(i => s"w$i").mkString(" "))
    assert(p(1).getString(2) == (11 to 20).map(i => s"w$i").mkString(" "))
    assert(p(2).getString(2) == (21 to 25).map(i => s"w$i").mkString(" "))
  }

  test("paragraphDedup keeps the earliest occurrence across and within docs") {
    val para = (1 to 10).map(i => s"p$i").mkString(" ") // one shared chunk
    val uniqA = (11 to 20).map(i => s"a$i").mkString(" ")
    val uniqB = (11 to 20).map(i => s"b$i").mkString(" ")
    val d = docs(
      (1L, s"$para $uniqA"), // first occurrence: keeps both chunks
      (2L, s"$para $uniqB"), // shared chunk already seen → dropped
      (3L, s"$para $para")   // both copies dropped (cross-doc earlier)
    )
    val out = Paragraphs.paragraphDedup(d, "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getAs[String]("kept_text") == s"$para $uniqA")
    assert(out(0).getAs[Long]("n_dropped") == 0L)
    assert(out(1).getAs[String]("kept_text") == uniqB)
    assert(out(1).getAs[Long]("n_dropped") == 1L)
    assert(out(2).getAs[String]("kept_text") == "")
    assert(out(2).getAs[Long]("n_kept") == 0L)
  }

  test("paragraphDedup never loses or invents words corpus-wide") {
    val d = Fixtures.documents(spark, "/root/testdata/sf0.001")
    val before = Paragraphs
      .paragraphs(d, "doc_id", "text")
      .select(explode(split(col("para"), " ")).as("w"))
      .count()
    val after = Paragraphs
      .paragraphDedup(d, "doc_id", "text")
      .filter(col("kept_text") =!= "")
      .select(explode(split(col("kept_text"), " ")).as("w"))
      .count()
    val dropped = Paragraphs
      .paragraphs(d, "doc_id", "text")
      .withColumn(
        "rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(md5(col("para").cast("binary")))
            .orderBy(col("doc_id"), col("para_idx"))
        )
      )
      .filter(col("rn") > 1)
      .select(explode(split(col("para"), " ")).as("w"))
      .count()
    assert(before == after + dropped)
  }

  test("qualityRepetition flags a looping document and passes a clean one") {
    val loop = ((1 to 10).map(i => s"x$i").mkString(" ") + " ") * 4 // 4 identical chunks
    val clean = (1 to 40).map(i => s"u$i").mkString(" ")
    val d = docs((1L, loop.trim), (2L, clean))
    // qualityRepetition reads the fixture table; test the signal math
    // on crafted docs through the same chunk expression
    val sig = d
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn(
        "paras",
        expr(
          "transform(sequence(0, CAST(ceil(size(w) / 10.0) AS INT) - 1), i -> concat_ws(' ', slice(w, i * 10 + 1, 10)))"
        )
      )
      .select(
        col("doc_id"),
        (size(col("paras")) - size(array_distinct(col("paras")))).cast("double")
          ./(size(col("paras"))).as("dup_line_frac")
      )
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(sig(1L) == 0.75) // 4 chunks, 1 distinct
    assert(sig(2L) == 0.0)
  }

  test("quality_repetition fixture run: fractions bounded and total") {
    val out = Paragraphs.qualityRepetition(spark, "/root/testdata/sf0.001").cache()
    assert(out.count() == 500L)
    val bad = out.filter(
      col("dup_line_frac") < 0 || col("dup_line_frac") > 1 ||
        col("dup_line_char_frac") < 0 || col("dup_line_char_frac") > 1 ||
        col("top_2gram_char_frac") < 0 || col("top_2gram_char_frac") > 1 ||
        col("dup_3gram_char_frac") < 0 || col("dup_3gram_char_frac") > 1
    )
    assert(bad.count() == 0L)
    out.unpersist()
  }
}
