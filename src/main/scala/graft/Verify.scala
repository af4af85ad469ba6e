package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened against a harness abort mid-run (a dead session must not
  * zero the round's correctness signal): the oracle map is written
  * FIRST, and a running `MANIFEST.json` (query → rows/status) is
  * rewritten after EVERY query — any partial run leaves a judgeable
  * record of what completed. The cache is cleared between query groups
  * so a long full-registry run cannot accrete executor memory.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.ops.Fixtures
      .sessionBuilder(s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle dump FIRST: the compare harness needs it for whatever
    // subset of dumps a partial run manages to write
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // optional comma-separated filter for local iteration (same hook as
    // Bench); the driver never sets it, so gate runs cover every query
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").map(_.trim).toSet)
    val manifest = scala.collection.mutable.LinkedHashMap[String, String]()
    def flushManifest(): Unit =
      Files.writeString(
        Paths.get(s"$outDir/MANIFEST.json"),
        manifest.map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}")
      )
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .zipWithIndex
      .foreach { case ((name, fn), i) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // read-back count is parquet-footer metadata, not a re-run
        val rows = spark.read.parquet(s"$outDir/$name").count()
        manifest(name) = s"""{"ok": true, "rows": $rows}"""
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        manifest(name) = s"""{"ok": false, "error": ${q(String.valueOf(e.getMessage).take(300))}}"""
      }
      flushManifest()
      // release anything a query family cached; demo indexes are disk-
      // backed (Fixtures.demoIndexDir), so nothing is lost, and a
      // constrained harness doesn't watch cached partitions accrete
      if ((i + 1) % 20 == 0) spark.catalog.clearCache()
    }
    spark.stop()
  }
}
