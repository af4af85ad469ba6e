package graft.core

/** Core metadata IR of the engine.
  *
  * Mirrors the working data model of the reference
  * (exasol/database-migration): every generator there operates over a
  * per-column metadata row — schema, table, column, ordinal position,
  * type, nullability, default — plus ordered composite key metadata
  * (see reference postgresql_to_exasol.sql:104-145). Here these are
  * first-class case classes, usable both driver-side (plan building)
  * and as Spark `Dataset[ColumnMeta]` rows.
  */
final case class ColumnMeta(
    schema: String,
    table: String,
    ordinal: Int,
    name: String,
    typeName: String,       // source-side type name, e.g. "numeric", "varchar"
    nullable: Boolean = true,
    default: Option[String] = None,
    comment: Option[String] = None,
    charLength: Option[Int] = None,
    precision: Option[Int] = None,
    scale: Option[Int] = None,
    datetimePrecision: Option[Int] = None
)

/** Ordered member of a PK or FK (composite order matters — reference
  * postgresql_to_exasol.sql:131-145 `unnest(conkey) with ordinality`).
  */
final case class KeyColumnMeta(
    schema: String,
    table: String,
    constraintName: String,
    keyType: KeyType,
    position: Int,
    column: String,
    refSchema: Option[String] = None,
    refTable: Option[String] = None,
    enabled: Boolean = false
)

sealed trait KeyType
object KeyType {
  case object PrimaryKey extends KeyType
  case object ForeignKey extends KeyType
}

final case class TableMeta(
    schema: String,
    table: String,
    comment: Option[String] = None,
    partitionColumn: Option[String] = None,
    distributionColumns: Seq[String] = Nil
)

/** Migration option enums — the documented edge-case policies of the
  * reference (SURVEY.md §1.2). Defaults follow the reference's
  * defaults; the Spark engine treats most of them as compatibility
  * flags (Spark has no 36-digit or 2M-char restriction).
  */
object options {
  sealed trait DecimalOverflow
  object DecimalOverflow {
    /** Fail loudly past the cap (reference postgresql_to_exasol.sql:150-157). */
    case object Cap extends DecimalOverflow
    case object ToDouble extends DecimalOverflow
    case object ToVarchar extends DecimalOverflow
  }

  sealed trait BinaryHandling
  object BinaryHandling {
    case object Base64 extends BinaryHandling
    case object Hex extends BinaryHandling
    case object Native extends BinaryHandling // Spark BinaryType — strictly stronger than the reference
    case object Skip extends BinaryHandling
  }

  sealed trait TemporalOutOfRange
  object TemporalOutOfRange {
    case object Fail extends TemporalOutOfRange
    case object Null extends TemporalOutOfRange
    case object Clamp extends TemporalOutOfRange
  }

  sealed trait IntervalHandling
  object IntervalHandling {
    case object Varchar extends IntervalHandling
    case object Native extends IntervalHandling
  }

  sealed trait ConstraintState
  object ConstraintState {
    case object ForceDisable extends ConstraintState
    case object SetAsSource extends ConstraintState
    case object ForceEnable extends ConstraintState
  }

  final case class MigrationOptions(
      identifierCaseInsensitive: Boolean = true,
      decimalOverflow: DecimalOverflow = DecimalOverflow.Cap,
      binaryHandling: BinaryHandling = BinaryHandling.Native,
      temporalOutOfRange: TemporalOutOfRange = TemporalOutOfRange.Fail,
      intervalHandling: IntervalHandling = IntervalHandling.Native,
      constraintState: ConstraintState = ConstraintState.ForceDisable,
      truncateLongStrings: Boolean = false,
      targetSchema: Option[String] = None
  )
}

/** One element of the ordered migration statement stream.
  *
  * The reference's user contract is a reviewable, ordered table of SQL
  * text (`RETURNS TABLE ... order by ord`,
  * postgresql_to_exasol.sql:59,388-403) with fixed section ord numbers
  * shared by every modern script: 0 warnings, 1-2 schemas, 3-4 tables,
  * 5-6 PKs, 7-8 FKs, 35-40 distribution/partition, 41-43 comments,
  * 50-51 imports, 60-62 constraint state, 70-74 validation, 90-91
  * views. The same numbers are kept here so dry-run output is
  * section-ordered identically.
  */
sealed abstract class MigrationAction(val ord: Int) {
  def sqlText: String
}
object MigrationAction {
  final case class UnsupportedWarning(text: String) extends MigrationAction(0) {
    def sqlText: String = s"-- UNSUPPORTED: $text"
  }
  final case class Note(text: String) extends MigrationAction(0) {
    def sqlText: String = s"-- NOTE: $text"
  }
  final case class CreateSchema(schema: String, stmt: String) extends MigrationAction(2) {
    def sqlText: String = stmt
  }
  final case class CreateTable(schema: String, table: String, stmt: String) extends MigrationAction(4) {
    def sqlText: String = stmt
  }
  final case class AddPrimaryKey(schema: String, table: String, stmt: String) extends MigrationAction(6) {
    def sqlText: String = stmt
  }
  final case class AddForeignKey(schema: String, table: String, stmt: String) extends MigrationAction(8) {
    def sqlText: String = stmt
  }
  final case class SetDistribution(schema: String, table: String, stmt: String) extends MigrationAction(35) {
    def sqlText: String = stmt
  }
  final case class SetPartition(schema: String, table: String, stmt: String) extends MigrationAction(38) {
    def sqlText: String = stmt
  }
  final case class Comment(schema: String, table: String, stmt: String) extends MigrationAction(42) {
    def sqlText: String = stmt
  }
  final case class Load(schema: String, table: String, stmt: String) extends MigrationAction(50) {
    def sqlText: String = stmt
  }
  final case class SetConstraintState(schema: String, table: String, stmt: String) extends MigrationAction(60) {
    def sqlText: String = stmt
  }
  final case class Validate(schema: String, table: String, stmt: String) extends MigrationAction(70) {
    def sqlText: String = stmt
  }
  final case class ViewReview(schema: String, view: String, stmt: String) extends MigrationAction(90) {
    def sqlText: String = s"-- REVIEW: $stmt"
  }
}
