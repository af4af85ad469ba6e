package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool (plan evidence, not part of the driver contract): print
  * the formatted physical plan of the bucketed index-writer relations
  * — the r17 single-shuffle formulation — next to the r16
  * groupBy-then-repartition shape, so the Exchange-count claim is
  * checkable without running a stream.
  *
  * `runMain graft.tools.ExplainIndexWrite <sfDir>`
  */
object ExplainIndexWrite {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = graft.ops.Fixtures.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = graft.ops.Fixtures.documents(s, sfDir)
    val nBuckets = 64L
    val bucket =
      expr(s"CAST(conv(substring(md5(cast(token as binary)), 1, 12), 16, 10) AS BIGINT) % $nBuckets")

    val tok = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), explode(col("toks")).as("token"))

    println("===== r16 shape: groupBy(token,doc,dl) THEN repartition(tbucket) =====")
    tok
      .groupBy(col("token"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tbucket", bucket)
      .repartition(col("tbucket"))
      .explain("formatted")

    println("===== r17 shape: repartition(tbucket) THEN groupBy(tbucket,token,doc,dl) =====")
    tok
      .withColumn("tbucket", bucket)
      .repartition(col("tbucket"))
      .groupBy(col("tbucket"), col("token"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .explain("formatted")
    s.stop()
  }
}
