package graft.core

import graft.SparkSpec
import java.nio.file.Files

/** The end-to-end slice of SURVEY.md §7.2: catalog read (parquet
  * footers) → plan → execute loads → differential validation with the
  * wide-metric compare. Run at sf0.001.
  */
class MigrationJobSpec extends SparkSpec {

  test("migrate nation+region+customer end to end with zero deviations") {
    val target = Files.createTempDirectory("graft_mig").toString
    val result = MigrationJob.run(
      spark,
      "/root/testdata/sf0.001",
      target,
      Seq("region", "nation", "customer")
    )
    assert(result.failures.isEmpty, result.failures.mkString("\n"))
    val loaded = result.outcomes.filter(_.status == "loaded")
    val validated = result.outcomes.filter(_.status == "validated")
    assert(loaded.size == 3 && validated.size == 3)
    // the loaded lake is readable and row-complete
    val src = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").count()
    val tgt = spark.read.parquet(s"$target/tpch.customer").count()
    assert(src == tgt && tgt > 0)
  }

  test("validation detects an injected deviation") {
    val src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val corrupted = src.limit(20) // dropped rows
    assert(ActionRunner.validate(src, corrupted) > 0)
    assert(ActionRunner.validate(src, src) == 0)
  }

  test("dry run previews without writing") {
    val target = Files.createTempDirectory("graft_dry").toString
    val cols = Catalog.readParquetColumns(spark, "/root/testdata/sf0.001", "tpch", Seq("region"))
    val plan = PlanBuilder.build(GenericJdbcDialect, cols, Nil)
    val out = ActionRunner.run(spark, plan, (_, t) => spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet"), target, dryRun = true)
    assert(out.forall(_.status == "previewed"))
    assert(!Files.list(java.nio.file.Paths.get(target)).findAny().isPresent)
  }
}
