package graft.sync

import graft.core.SourceDialect

/** The delta_import decision tree (SURVEY.md §3.3; reference
  * delta_import/delta_import_on_primary_keys.sql:374-435):
  *
  *   - no PK                    → truncate target + full reload
  *   - PK, no delta column      → full load into staging + MERGE on PK
  *   - PK + delta col, no rows  → same (NULL watermark)
  *   - PK + delta col + rows    → staged load of `WHERE delta >= <wm>`
  *                                (inclusive — the boundary row is
  *                                re-imported, :421) + MERGE on PK
  *
  * The planner is pure; execution maps TruncateFullReload to an
  * overwrite write and the merge strategies to DeltaSync.merge (the
  * full-outer-join MERGE rewrite).
  */
object DeltaImportPlanner {

  sealed trait Strategy
  case object TruncateFullReload extends Strategy
  case object StagedFullMerge extends Strategy
  final case class StagedDeltaMerge(deltaPredicate: String) extends Strategy

  final case class TableSync(
      pkColumns: Seq[String],
      deltaColumn: Option[String],
      deltaColumnType: String = "timestamp",
      watermark: Option[String] = None
  )

  def decide(sync: TableSync, dialect: SourceDialect): Strategy =
    if (sync.pkColumns.isEmpty) TruncateFullReload
    else
      (sync.deltaColumn, sync.watermark) match {
        case (Some(col), Some(wm)) =>
          StagedDeltaMerge(
            s"${dialect.quoteIdent(col)} >= ${dialect.deltaLiteral(wm, sync.deltaColumnType)}"
          )
        case _ => StagedFullMerge
      }
}
