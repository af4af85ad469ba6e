package graft.core

import org.scalatest.funsuite.AnyFunSuite
import FkHarmonizer._

class FkHarmonizerSpec extends AnyFunSuite {

  private def ref(t: String, c: String = "k") = ColRef("s", t, c)
  private def edge(name: String, a: ColRef, b: ColRef, enabled: Boolean = false) =
    FkEdge(name, a, b, enabled)

  test("union-find components match naive BFS components") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 100) {
      val nNodes = 2 + rnd.nextInt(30)
      val nodes = Vector.tabulate(nNodes)(i => ref(s"t$i"))
      val edges = List.fill(rnd.nextInt(40)) {
        val a = nodes(rnd.nextInt(nNodes))
        val b = nodes(rnd.nextInt(nNodes))
        edge(s"fk_${rnd.nextInt(10000)}", a, b)
      }
      if (edges.nonEmpty) {
        val got = groups(edges).values.map(_.toSet).toSet
        // naive: BFS over the undirected edge graph
        val adj = edges
          .flatMap(e => Seq(e.child -> e.parent, e.parent -> e.child))
          .groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap
        val all = edges.flatMap(e => Seq(e.child, e.parent)).toSet
        var seen = Set.empty[ColRef]
        val expected = scala.collection.mutable.Set.empty[Set[ColRef]]
        all.foreach { start =>
          if (!seen(start)) {
            var comp = Set(start)
            var frontier = Set(start)
            while (frontier.nonEmpty) {
              frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- comp
              comp ++= frontier
            }
            seen ++= comp
            expected += comp
          }
        }
        assert(got == expected.toSet)
      }
    }
  }

  test("group id is the lexicographically smallest member") {
    val es = Seq(edge("f1", ref("b"), ref("a")), edge("f2", ref("c"), ref("b")))
    val gs = groups(es)
    assert(gs.keySet == Set(ref("a")))
    assert(gs(ref("a")).toSet == Set(ref("a"), ref("b"), ref("c")))
  }

  test("mergeTargets: decimals merge to max-int-digits + max-scale") {
    assert(
      mergeTargets(Seq(DecimalSpec(10, 2), DecimalSpec(18, 0), DecimalSpec(5, 4))) ==
        Some(DecimalSpec(22, 4)) // int digits max = 18, scale max = 4
    )
  }

  test("mergeTargets: varchar merges to max length; mixed families don't merge") {
    assert(mergeTargets(Seq(VarcharSpec(10), VarcharSpec(40))) == Some(VarcharSpec(40)))
    assert(mergeTargets(Seq(VarcharSpec(10), DecimalSpec(9, 0))) == None)
    assert(mergeTargets(Seq(OpaqueSpec("DATE"), OpaqueSpec("DATE"))) == Some(OpaqueSpec("DATE")))
    assert(mergeTargets(Seq(OpaqueSpec("DATE"), OpaqueSpec("BOOLEAN"))) == None)
  }

  test("plan drops FKs first, modifies changed members, re-adds in original state") {
    val child = ref("orders", "cust_id")
    val parent = ref("customer", "id")
    val e = edge("orders_fk", child, parent, enabled = true)
    val types = Map[ColRef, TypeSpec](child -> DecimalSpec(9, 0), parent -> DecimalSpec(18, 0))
    val actions = plan(Seq(e), types)
    val sqls = actions.map(_.sql)
    assert(sqls.head.contains("DROP CONSTRAINT \"ORDERS_FK\""))
    assert(sqls.exists(_.contains("MODIFY (\"CUST_ID\" DECIMAL(18,0))")))
    // parent already DECIMAL(18,0) → not modified
    assert(!sqls.exists(_.contains("\"CUSTOMER\" MODIFY")))
    assert(sqls.last.contains("ADD CONSTRAINT \"ORDERS_FK\"") && sqls.last.contains("ENABLE"))
    // order: DROP before MODIFY before ADD
    val di = sqls.indexWhere(_.contains("DROP"))
    val mi = sqls.indexWhere(_.contains("MODIFY"))
    val ai = sqls.indexWhere(_.contains("ADD CONSTRAINT"))
    assert(di < mi && mi < ai)
  }

  test("plan emits note for mixed-family groups and nothing when no change needed") {
    val a = ref("t1"); val b = ref("t2")
    val mixed = plan(Seq(edge("f", a, b)), Map[ColRef, TypeSpec](a -> VarcharSpec(5), b -> DecimalSpec(9, 0)))
    assert(mixed.exists(_.sql.contains("NOTE")))
    val same = plan(Seq(edge("f", a, b)), Map[ColRef, TypeSpec](a -> DecimalSpec(9, 0), b -> DecimalSpec(9, 0)))
    assert(same.isEmpty)
  }
}
