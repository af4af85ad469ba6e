package graft.core

/** FK-group type harmonization (convert_datatypes.sql:148-196,516-662;
  * convert_varchar.sql:225-250,621-786): foreign keys link columns into
  * a graph; every connected component ("referential key group") must
  * land on ONE common type, computed as the tightest type that covers
  * every member's needs within its family — never a blanket VARCHAR.
  * The change plan drops the group's FKs first, modifies every member
  * column, then re-adds the FKs in their original enabled state.
  *
  * Pure driver-side metadata algorithm (union-find over a
  * Dataset-collected edge list) — the data tables are never touched
  * until the emitted MODIFYs run.
  */
object FkHarmonizer {

  final case class ColRef(schema: String, table: String, column: String) {
    def qualified: String = s""""${schema.toUpperCase}"."${table.toUpperCase}"."${column.toUpperCase}""""
  }

  final case class FkEdge(
      constraintName: String,
      child: ColRef,
      parent: ColRef,
      enabled: Boolean
  )

  /** A proposed column type within one family. Families mirror the
    * reference's merge_targets: DECIMAL(p,s) / VARCHAR(n) / other
    * (opaque — group kept only if all members agree).
    */
  sealed trait TypeSpec {
    def render: String
  }
  final case class DecimalSpec(precision: Int, scale: Int) extends TypeSpec {
    def render = s"DECIMAL($precision,$scale)"
  }
  final case class VarcharSpec(length: Int) extends TypeSpec {
    def render = s"VARCHAR($length)"
  }
  final case class OpaqueSpec(typeName: String) extends TypeSpec {
    def render = typeName
  }

  /** Union-find with path compression + union by size. */
  final class UnionFind[A] {
    private val parent = scala.collection.mutable.Map.empty[A, A]
    private val size = scala.collection.mutable.Map.empty[A, Int]

    def find(a: A): A = {
      val p = parent.getOrElseUpdate(a, a)
      if (p == a) a
      else {
        val root = find(p)
        parent(a) = root
        root
      }
    }

    def union(a: A, b: A): Unit = {
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        val sa = size.getOrElse(ra, 1)
        val sb = size.getOrElse(rb, 1)
        val (big, small) = if (sa >= sb) (ra, rb) else (rb, ra)
        parent(small) = big
        size(big) = sa + sb
      }
    }

    def components(all: Iterable[A]): Map[A, Seq[A]] =
      all.toSeq.distinct.groupBy(find)
  }

  /** Connected components of the FK column graph. Component ids are
    * deterministic: the lexicographically smallest member.
    */
  def groups(edges: Seq[FkEdge]): Map[ColRef, Seq[ColRef]] = {
    val uf = new UnionFind[ColRef]
    edges.foreach(e => uf.union(e.child, e.parent))
    val members = edges.flatMap(e => Seq(e.child, e.parent))
    uf.components(members)
      .map { case (_, ms) =>
        val sorted = ms.sortBy(c => (c.schema, c.table, c.column))
        sorted.head -> sorted
      }
  }

  /** Tightest common type for one group (the reference's
    * merge_targets): within DECIMAL merge (max integer digits) + (max
    * scale); within VARCHAR merge max length; mixed or opaque families
    * → None (group left unchanged, with a note — the reference's
    * "keep + note" path).
    */
  def mergeTargets(specs: Seq[TypeSpec]): Option[TypeSpec] = {
    val decs = specs.collect { case d: DecimalSpec => d }
    val vchars = specs.collect { case v: VarcharSpec => v }
    val opaques = specs.collect { case o: OpaqueSpec => o }
    if (decs.size == specs.size && specs.nonEmpty) {
      val intDigits = decs.map(d => d.precision - d.scale).max
      val scale = decs.map(_.scale).max
      Some(DecimalSpec(math.min(36, intDigits + scale), scale))
    } else if (vchars.size == specs.size && specs.nonEmpty) {
      Some(VarcharSpec(vchars.map(_.length).max))
    } else if (opaques.size == specs.size && opaques.map(_.typeName).distinct.size == 1) {
      Some(opaques.head)
    } else None
  }

  /** One step of the emitted change plan. */
  sealed trait Action { def sql: String }
  final case class DropFk(e: FkEdge) extends Action {
    def sql =
      s"""ALTER TABLE "${e.child.schema.toUpperCase}"."${e.child.table.toUpperCase}" DROP CONSTRAINT "${e.constraintName.toUpperCase}";"""
  }
  final case class ModifyColumn(c: ColRef, t: TypeSpec) extends Action {
    def sql =
      s"""ALTER TABLE "${c.schema.toUpperCase}"."${c.table.toUpperCase}" MODIFY ("${c.column.toUpperCase}" ${t.render});"""
  }
  final case class ReAddFk(e: FkEdge) extends Action {
    def sql =
      s"""ALTER TABLE "${e.child.schema.toUpperCase}"."${e.child.table.toUpperCase}" ADD CONSTRAINT "${e.constraintName.toUpperCase}" FOREIGN KEY ("${e.child.column.toUpperCase}") REFERENCES "${e.parent.schema.toUpperCase}"."${e.parent.table.toUpperCase}" ${if (e.enabled) "ENABLE" else "DISABLE"};"""
  }
  final case class Note(text: String) extends Action {
    def sql = s"-- NOTE: $text"
  }

  /** Full harmonization plan: per group with a merge target whose type
    * actually changes a member — DROP FKs, MODIFY members, RE-ADD FKs
    * (original state); groups without a common target get a Note.
    * Ordering is deterministic (group id, then member/constraint).
    */
  def plan(edges: Seq[FkEdge], currentTypes: Map[ColRef, TypeSpec]): Seq[Action] = {
    val gs = groups(edges).toSeq.sortBy(g => (g._1.schema, g._1.table, g._1.column))
    gs.flatMap { case (gid, members) =>
      val specs = members.flatMap(currentTypes.get)
      if (specs.size != members.size)
        Seq(Note(s"group ${gid.qualified}: missing type metadata; skipped"))
      else
        mergeTargets(specs) match {
          case None =>
            Seq(Note(s"group ${gid.qualified}: mixed type families; left unchanged"))
          case Some(target) =>
            val changing = members.filter(m => currentTypes(m) != target)
            if (changing.isEmpty) Seq.empty
            else {
              val groupEdges = edges
                .filter(e => members.contains(e.child) || members.contains(e.parent))
                .sortBy(_.constraintName)
              groupEdges.map(DropFk.apply) ++
                changing.map(m => ModifyColumn(m, target)) ++
                groupEdges.map(ReAddFk.apply)
            }
        }
    }
  }
}
