package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.options.MigrationOptions

/** Action runner: executes a MigrationPlan against a parquet-lake
  * target. Mirrors the reference's review-then-execute contract: the
  * dry-run path returns the statement stream untouched; the execute
  * path maps each action to its Spark job and records a per-statement
  * outcome (the reference's apply executor,
  * convert_datatypes.sql:495-512,664-703).
  */
object ActionRunner {

  final case class Outcome(ord: Int, stmt: String, status: String)

  /** Execute the plan: Load = read source table → write parquet into
    * the target lake; Validate = wide-metric comparison source vs
    * loaded target (zero deviations = success). DDL/constraint actions
    * are metadata-only in a parquet lake and recorded as applied.
    */
  def run(
      spark: SparkSession,
      plan: PlanBuilder.MigrationPlan,
      sourceTable: (String, String) => DataFrame,
      targetDir: String,
      dryRun: Boolean = false
  ): Seq[Outcome] = {
    val ordered = plan.actions.sortBy(a => (a.ord, a.sqlText))
    if (dryRun) return ordered.map(a => Outcome(a.ord, a.sqlText, "previewed"))
    ordered.map { a =>
      val status =
        try {
          a match {
            case MigrationAction.Load(s, t, _) =>
              sourceTable(s, t).write.mode("overwrite").parquet(s"$targetDir/$s.$t")
              "loaded"
            case MigrationAction.Validate(s, t, _) =>
              val src = sourceTable(s, t)
              val tgt = spark.read.parquet(s"$targetDir/$s.$t")
              val dev = validate(src, tgt)
              if (dev == 0) "validated" else s"DEVIATIONS: $dev"
            case _ => "applied"
          }
        } catch { case e: Exception => s"ERROR: ${e.getMessage}" }
      Outcome(a.ord, a.sqlText, status)
    }
  }

  /** Differential validation: the wide metric row of both sides,
    * type-gated by dtype, compared null-safely; returns the deviation
    * count (reference CHECK_MIGRATION, §2.E).
    */
  def validate(source: DataFrame, target: DataFrame): Long = {
    import graft.ops.CheckMigration
    val numeric = source.schema.fields.collect {
      case f if f.dataType.typeName == "double" => (f.name, 2)
      case f if f.dataType.typeName.startsWith("decimal") => (f.name, 2)
      case f if Set("long", "integer", "short").contains(f.dataType.typeName) => (f.name, 0)
    }.toSeq
    val strings = source.schema.fields.collect { case f if f.dataType.typeName == "string" => f.name }.toSeq
    val ts = source.schema.fields.collect {
      case f if f.dataType.typeName.startsWith("timestamp") => f.name
    }.toSeq
    val metricCols = Seq("row_cnt") ++
      numeric.flatMap { case (c, _) => Seq(s"${c}_nulls", s"${c}_min", s"${c}_max", s"${c}_sum") } ++
      strings.flatMap(c => Seq(s"${c}_nulls", s"${c}_distinct", s"${c}_minlen", s"${c}_maxlen")) ++
      ts.flatMap(c => Seq(s"${c}_min", s"${c}_max"))
    val a = CheckMigration.wideMetricsAgg(source, numeric, strings, ts)
    val b = CheckMigration.wideMetricsAgg(target, numeric, strings, ts)
    CheckMigration
      .deviationReport(a, b, metricCols)
      .filter(col("status") === "DEVIATION")
      .count()
  }
}

/** The end-to-end migration slice of SURVEY.md §7.2: catalog → plan →
  * execute loads → validate. Source here is the parquet fixture lake
  * (the offline stand-in for a JDBC source); the JDBC path shares
  * everything but the `sourceTable` function.
  */
object MigrationJob {

  final case class Result(outcomes: Seq[ActionRunner.Outcome]) {
    def failures: Seq[ActionRunner.Outcome] =
      outcomes.filter(o => o.status.startsWith("ERROR") || o.status.startsWith("DEVIATIONS"))
  }

  def run(
      spark: SparkSession,
      sfDir: String,
      targetDir: String,
      tables: Seq[String],
      opts: MigrationOptions = MigrationOptions()
  ): Result = {
    val cols = Catalog.readParquetColumns(spark, sfDir, "tpch", tables)
    val plan = PlanBuilder.build(GenericJdbcDialect, cols, Nil, opts)
    val outcomes = ActionRunner.run(
      spark,
      plan,
      (_, t) => spark.read.parquet(s"$sfDir/$t.parquet"),
      targetDir
    )
    Result(outcomes)
  }
}
