package graft.optimize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Apply-side of the type-narrowing pipeline
  * (convert_datatypes.sql:495-512,664-703): each proposal is applied
  * only after an in-data losslessness proof — cast forward, cast back,
  * count mismatches; any violation rejects that proposal (the data
  * changed since profiling, or the proposal was wrong) and keeps the
  * column untouched. Outcomes are reported per proposal, mirroring the
  * reference's per-statement success column.
  *
  * The proof is one aggregate over the candidate columns (single scan
  * for all proposals), then one projection — no per-proposal passes.
  */
object SchemaNarrower {

  final case class Proposal(column: String, target: DataType)
  final case class Outcome(column: String, target: String, status: String)

  /** Lossy-value counter. try_cast, not cast: under ANSI mode an
    * overflowing cast throws — the probe must observe the loss, not
    * die of it (a null-from-try_cast on a non-null input counts as a
    * violation alongside round-trip mismatches).
    */
  private def roundTrips(name: String, dt: DataType, original: DataType): Column = {
    val fwd = expr(s"try_cast(`$name` AS ${dt.sql})")
    sum(
      when(col(name).isNotNull && (fwd.isNull || fwd.cast(original) =!= col(name)), 1).otherwise(0)
    )
  }

  /** Verify and apply: returns the narrowed frame + per-proposal
    * outcomes ("applied" / "rejected: N lossy values" /
    * "rejected: unknown column").
    */
  def apply(df: DataFrame, proposals: Seq[Proposal]): (DataFrame, Seq[Outcome]) = {
    val known = proposals.filter(p => df.columns.contains(p.column))
    val unknown = proposals.diff(known)
    val violations: Map[String, Long] =
      if (known.isEmpty) Map.empty
      else {
        val aggs = known.map { p =>
          val original = df.schema(p.column).dataType
          roundTrips(p.column, p.target, original).cast("bigint").as(p.column)
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        known.map(p => p.column -> row.getAs[Long](p.column)).toMap
      }
    val applied = known.filter(p => violations(p.column) == 0L)
    val narrowed = applied.foldLeft(df)((d, p) => d.withColumn(p.column, col(p.column).cast(p.target)))
    val outcomes =
      known.map { p =>
        if (violations(p.column) == 0L) Outcome(p.column, p.target.sql, "applied")
        else Outcome(p.column, p.target.sql, s"rejected: ${violations(p.column)} lossy values")
      } ++ unknown.map(p => Outcome(p.column, p.target.sql, "rejected: unknown column"))
    (narrowed, outcomes)
  }

  /** Dry-run: outcomes only, frame untouched. */
  def dryRun(df: DataFrame, proposals: Seq[Proposal]): Seq[Outcome] = apply(df, proposals)._2
}
