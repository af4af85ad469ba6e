package graft.core

import graft.core.options.{ConstraintState, MigrationOptions}
import MigrationAction._

/** Pure plan builder: catalog metadata → ordered `Seq[MigrationAction]`
  * — the reference's generator pipeline re-expressed as a driver-side
  * function (SURVEY.md §3.1 step 2). The emitted stream follows the
  * fixed section ordinals (0 warnings … 90 views) and is rendered as
  * reviewable text (dry-run-first contract, README.md:90-91).
  *
  * Everything here is metadata-scale (thousands of rows, driver-side);
  * the data-scale work happens only when the ActionRunner executes the
  * Load/Validate actions as Spark jobs.
  */
object PlanBuilder {

  final case class MigrationPlan(actions: Seq[MigrationAction]) {
    /** Stable review rendering: (ord, stmt) sorted by section then text. */
    def rendered: Seq[(Int, String)] =
      actions.map(a => (a.ord, a.sqlText)).sortBy { case (o, s) => (o, s) }
    def renderedText: String = rendered.map { case (o, s) => f"$o%3d  $s" }.mkString("\n")
  }

  private def up(s: String, opts: MigrationOptions): String =
    if (opts.identifierCaseInsensitive) s.toUpperCase else s
  private def q(s: String, opts: MigrationOptions): String =
    "\"" + up(s, opts).replace("\"", "\"\"") + "\""
  private def qual(schema: String, table: String, opts: MigrationOptions): String =
    s"${q(schema, opts)}.${q(table, opts)}"

  def build(
      dialect: SourceDialect,
      columns: Seq[ColumnMeta],
      keys: Seq[KeyColumnMeta],
      opts: MigrationOptions = MigrationOptions()
  ): MigrationPlan = {
    val targetSchemaOf: String => String = s => opts.targetSchema.getOrElse(s)
    val byTable = columns.groupBy(c => (c.schema, c.table)).toSeq.sortBy(_._1)
    val migrated = byTable.map(_._1).toSet

    val schemas = byTable.map(_._1._1).map(targetSchemaOf).distinct.sorted.map { s =>
      CreateSchema(s, s"CREATE SCHEMA IF NOT EXISTS ${q(s, opts)};")
    }

    val tables = byTable.map { case ((s, t), cols) =>
      val colDefs = cols
        .sortBy(_.ordinal)
        .map { c =>
          val d = c.default.map(dv => s" DEFAULT $dv").getOrElse("")
          val nn = if (!c.nullable) " NOT NULL" else ""
          s"${q(c.name, opts)} ${dialect.targetTypeString(c, opts)}$d$nn"
        }
        .mkString(", ")
      CreateTable(s, t, s"CREATE TABLE ${qual(targetSchemaOf(s), t, opts)} ($colDefs);")
    }

    val pks = keys
      .filter(_.keyType == KeyType.PrimaryKey)
      .groupBy(k => (k.schema, k.table, k.constraintName))
      .toSeq
      .sortBy(_._1)
      .collect {
        case ((s, t, cn), ks) if migrated((s, t)) =>
          val cols = ks.sortBy(_.position).map(k => q(k.column, opts)).mkString(",")
          AddPrimaryKey(
            s,
            t,
            s"ALTER TABLE ${qual(targetSchemaOf(s), t, opts)} ADD CONSTRAINT ${q(cn, opts)} PRIMARY KEY ($cols) DISABLE;"
          )
      }

    // FK parent outside the migrated set → skipped (the reference's
    // exists guard, postgresql_to_exasol.sql:374-378); TARGET_SCHEMA
    // redirection applies to the parent too (:89-93).
    val fks = keys
      .filter(_.keyType == KeyType.ForeignKey)
      .groupBy(k => (k.schema, k.table, k.constraintName))
      .toSeq
      .sortBy(_._1)
      .flatMap { case ((s, t, cn), ks) =>
        val head = ks.head
        val parent = for { rs <- head.refSchema; rt <- head.refTable } yield (rs, rt)
        parent match {
          case Some((rs, rt)) if migrated((rs, rt)) && migrated((s, t)) =>
            val cols = ks.sortBy(_.position).map(k => q(k.column, opts)).mkString(",")
            Some(
              AddForeignKey(
                s,
                t,
                s"ALTER TABLE ${qual(targetSchemaOf(s), t, opts)} ADD CONSTRAINT ${q(cn, opts)} FOREIGN KEY ($cols) REFERENCES ${qual(targetSchemaOf(rs), rt, opts)} DISABLE;"
              )
            )
          case Some((rs, rt)) if migrated((s, t)) =>
            Some(Note(s"FK ${up(cn, opts)} skipped: parent ${up(rs, opts)}.${up(rt, opts)} not in migration scope"))
          case _ => None
        }
      }

    val loads = byTable.map { case ((s, t), cols) =>
      val exprs = cols.sortBy(_.ordinal).map(c => dialect.readExpression(c, opts)).mkString(", ")
      Load(
        s,
        t,
        s"LOAD INTO ${qual(targetSchemaOf(s), t, opts)} FROM ${dialect.name.toUpperCase} STATEMENT 'SELECT $exprs FROM ${dialect.quoteIdent(s)}.${dialect.quoteIdent(t)}';"
      )
    }

    // CONSTRAINT STATE epilogue — PKs before FKs
    // (postgresql_to_exasol.sql:244-247,400-402). SET_AS_SOURCE honors
    // each key's recorded enabled/disabled state (the SQL Server
    // per-key behavior, sqlserver_to_exasol.sql:369-379).
    val emittedKeys: Seq[(String, String, String, String, Boolean)] =
      (pks.map(p => (p.schema, p.table, "PRIMARY KEY")) ++
        fks.collect { case f: AddForeignKey => (f.schema, f.table, "FOREIGN KEY") }).distinct.map {
        case (s, t, kind) =>
          val kt = if (kind == "PRIMARY KEY") KeyType.PrimaryKey else KeyType.ForeignKey
          val enabled = keys.exists(k => k.schema == s && k.table == t && k.keyType == kt && k.enabled)
          (s, t, kind, if (enabled) "ENABLE" else "DISABLE", enabled)
      }
    val states = opts.constraintState match {
      case ConstraintState.ForceDisable => Nil // created DISABLE already
      case ConstraintState.ForceEnable =>
        emittedKeys.map { case (s, t, kind, _, _) =>
          SetConstraintState(
            s,
            t,
            s"ALTER TABLE ${qual(targetSchemaOf(s), t, opts)} MODIFY CONSTRAINT $kind ENABLE;"
          )
        }
      case ConstraintState.SetAsSource =>
        // keys are created DISABLE; only source-enabled ones need a MODIFY
        emittedKeys.collect {
          case (s, t, kind, verb, true) =>
            SetConstraintState(
              s,
              t,
              s"ALTER TABLE ${qual(targetSchemaOf(s), t, opts)} MODIFY CONSTRAINT $kind $verb;"
            )
        }
    }

    val validates = byTable.map { case ((s, t), _) =>
      Validate(s, t, s"VALIDATE ${qual(targetSchemaOf(s), t, opts)} USING WIDE_METRICS;")
    }

    MigrationPlan(schemas ++ tables ++ pks ++ fks ++ loads ++ states ++ validates)
  }
}
