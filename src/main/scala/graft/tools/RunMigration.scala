package graft.tools

import graft.core.{ActionRunner, JobLog, MigrationJob}

/** CLI entry point: migrate fixture tables into a parquet lake with
  * full validation and a job log — the user-facing shape of the
  * reference's `EXECUTE SCRIPT ... <SOURCE>_TO_EXASOL(...)` run.
  *
  * Usage: runMain graft.tools.RunMigration <srcDir> <targetDir> [table ...]
  */
object RunMigration {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val targetDir = if (args.length > 1) args(1) else "/tmp/graft_migration"
    val tables =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

    val spark = graft.ops.Fixtures
      .sessionBuilder(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val log = new JobLog(s"migrate:$srcDir")
    val result = log.step[MigrationJob.Result]("migration", _.outcomes.size.toLong) {
      MigrationJob.run(spark, srcDir, targetDir, tables)
    }

    println(f"${"ord"}%4s  ${"status"}%-14s stmt")
    result.outcomes.foreach(o => println(f"${o.ord}%4d  ${o.status}%-14s ${o.stmt.take(100)}"))
    val failed = result.failures
    println(s"\n${result.outcomes.size} statements, ${failed.size} failures")
    log.log.foreach(e => println(s"[joblog] ${e.job_name} step ${e.step} ${e.action}: ${e.status} (${e.duration_ms} ms)"))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
