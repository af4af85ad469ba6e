package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

class JsonlLoaderSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("doc_id", "long")
    .add("lang", "string")
    .add("text", "string")

  test("quarantine catches non-JSON, truncated JSON and type mismatches verbatim") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_spec").resolve("src").toString
    Seq((1L, "en", "good one"), (2L, "de", "gut zwei"))
      .toDF("doc_id", "lang", "text")
      .coalesce(1)
      .write
      .json(dir)
    val badLines = Seq(
      "garbage line",
      "{\"doc_id\": 3, \"lang\": \"en\", \"text\": \"truncat",
      "{\"doc_id\": \"NaN\", \"lang\": \"xx\", \"text\": \"mismatch\"}"
    )
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "bad.txt"),
      scala.jdk.CollectionConverters.SeqHasAsJava(badLines).asJava
    )
    val (good, corrupt, raw) = JsonlLoader.readWithQuarantine(spark, dir, schema)
    try {
      val g = good.orderBy("doc_id").as[(Long, String, String)].collect().toSeq
      assert(g == Seq((1L, "en", "good one"), (2L, "de", "gut zwei")), g.toString)
      val c = corrupt.as[String].collect().sorted.toSeq
      assert(c == badLines.sorted, "quarantine must hold the raw lines verbatim")
      // nothing in the good side carries a null-parse shadow of a bad line
      assert(good.filter(col("doc_id").isNull).count() == 0)
    } finally JsonlLoader.release(raw)
  }

  test("clean input quarantines nothing and round-trips exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_clean").resolve("src").toString
    val docs = (1L to 50L).map(i => (i, if (i % 2 == 0) "en" else "de", s"text $i"))
    docs.toDF("doc_id", "lang", "text").repartition(3).write.json(dir)
    val (good, corrupt, raw) = JsonlLoader.readWithQuarantine(spark, dir, schema)
    try {
      assert(corrupt.count() == 0)
      assert(good.as[(Long, String, String)].collect().sorted.toSeq == docs.sorted)
    } finally JsonlLoader.release(raw)
  }
}
