package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. Failures are reported in a separate
  * `errors` map (not folded into timings — a failed query must not
  * masquerade as a fast one).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.ops.Fixtures
      .sessionBuilder(s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the session (JVM/codegen/file-listing) on the smallest SF so
    // per-query numbers measure the queries, not first-run setup.
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }

    // optional comma-separated filter for local iteration; the driver
    // never sets it, so per-round benches always cover every query
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted.filter(n => only.forall(_.contains(n)))
    var times = Vector.empty[(String, Double)]
    var errors = Vector.empty[(String, String)]
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        times :+= (name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          errors :+= (name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    // millisecond precision keeps the line short — a long line risks
    // head-truncation in tail-style output capture
    def r3(v: Double): String = f"$v%.3f"
    val qs = times.map { case (k, v) => s"${jstr(k)}:${r3(v)}" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = times.map(_._2).sum
    val json =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}"""
    // belt and braces: the full JSON also lands in a file, so a
    // truncated stdout capture can always be reconstructed
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/graft_bench.json"), json)
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
