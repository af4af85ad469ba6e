package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.options._
import graft.ops.Movement

class PlanBuilderSpec extends AnyFunSuite {

  private def plan = PlanBuilder.build(GenericJdbcDialect, Movement.fixtureColumnMeta, Movement.fixtureKeyMeta)

  test("sections appear in reference ord order") {
    val ords = plan.rendered.map(_._1)
    assert(ords == ords.sorted)
    assert(ords.distinct == Seq(0, 2, 4, 6, 8, 50, 70)) // note, schema, table, pk, fk, load, validate
  }

  test("golden: CREATE TABLE region") {
    val stmt = plan.rendered.collectFirst {
      case (4, s) if s.contains("\"REGION\"") => s
    }.get
    assert(
      stmt ==
        """CREATE TABLE "TPCH"."REGION" ("R_REGIONKEY" DECIMAL(9,0) NOT NULL, "R_NAME" VARCHAR(25) NOT NULL);"""
    )
  }

  test("composite PK order and out-of-scope FK note") {
    val pk = plan.rendered.collectFirst { case (6, s) if s.contains("LINEITEM_PK") => s }.get
    assert(pk.contains("""("L_ORDERKEY","L_LINENUMBER")"""))
    val notes = plan.rendered.filter(_._1 == 0).map(_._2)
    assert(notes.exists(n => n.contains("ORDERS_CURRENCY_FK") && n.contains("not in migration scope")))
    assert(!plan.rendered.exists { case (8, s) => s.contains("CURRENCY") case _ => false })
  }

  test("loads carry per-column read expressions in ordinal order") {
    val load = plan.rendered.collectFirst { case (50, s) if s.contains("\"NATION\"") => s }.get
    assert(load.contains("SELECT \"n_nationkey\", \"n_name\", \"n_regionkey\" FROM"))
  }

  test("TARGET_SCHEMA redirects tables and FK parents") {
    val p = PlanBuilder.build(
      GenericJdbcDialect,
      Movement.fixtureColumnMeta,
      Movement.fixtureKeyMeta,
      MigrationOptions(targetSchema = Some("stage"))
    )
    val fk = p.rendered.collectFirst { case (8, s) if s.contains("CUSTOMER_NATION_FK") => s }.get
    assert(fk.contains("\"STAGE\".\"CUSTOMER\"") && fk.contains("REFERENCES \"STAGE\".\"NATION\""))
  }

  test("ForceEnable emits constraint-state epilogue, PK and FK") {
    val p = PlanBuilder.build(
      GenericJdbcDialect,
      Movement.fixtureColumnMeta,
      Movement.fixtureKeyMeta,
      MigrationOptions(constraintState = ConstraintState.ForceEnable)
    )
    val states = p.rendered.filter(_._1 == 60).map(_._2)
    assert(states.nonEmpty)
    assert(states.forall(_.contains("MODIFY CONSTRAINT")))
    assert(states.exists(_.contains("PRIMARY KEY ENABLE")))
  }

  test("SetAsSource honors per-key source state") {
    val enabledPk = Movement.fixtureKeyMeta.map {
      case k if k.table == "orders" && k.keyType == KeyType.PrimaryKey => k.copy(enabled = true)
      case k => k
    }
    val p = PlanBuilder.build(
      GenericJdbcDialect,
      Movement.fixtureColumnMeta,
      enabledPk,
      MigrationOptions(constraintState = ConstraintState.SetAsSource)
    )
    val states = p.rendered.filter(_._1 == 60).map(_._2)
    // only the source-enabled key gets a MODIFY back to ENABLE
    assert(states == Seq("""ALTER TABLE "TPCH"."ORDERS" MODIFY CONSTRAINT PRIMARY KEY ENABLE;"""))
  }

  test("case-sensitive mode preserves identifier case") {
    val p = PlanBuilder.build(
      GenericJdbcDialect,
      Movement.fixtureColumnMeta,
      Movement.fixtureKeyMeta,
      MigrationOptions(identifierCaseInsensitive = false)
    )
    assert(p.rendered.exists { case (4, s) => s.contains("\"tpch\".\"region\"") case _ => false })
  }
}
