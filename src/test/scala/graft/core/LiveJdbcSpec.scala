package graft.core

import java.sql.DriverManager
import graft.SparkSpec
import graft.ops.Movement

/** End-to-end live migration against embedded Derby — the live-target
  * analog of MigrationJobSpec's parquet-lake run. Every stage runs for
  * real: DDL over JDBC, parallel JDBC load, post-load NOT NULL + PK +
  * FK import, predicate-parallel read-back validation — and the
  * imported constraints are shown to be ENFORCED by the live engine,
  * not just recorded.
  */
class LiveJdbcSpec extends SparkSpec {

  System.setProperty("derby.system.home", "/tmp")

  private val sfDir = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "orders")

  test("live migration: DDL, load, key import and validation all succeed on Derby") {
    val url = "jdbc:derby:memory:graft_live;create=true"
    val cols = Catalog.readParquetColumns(spark, sfDir, "tpch", tables)
    // full fixture key set: keys for out-of-scope tables (lineitem,
    // supplier, part) and the FK to the unmigrated currency parent
    // must be scoped out by the executor, not by the caller
    val keys = Movement.fixtureKeyMeta
    val outcomes = LiveJdbc.execute(
      spark,
      url,
      cols,
      keys,
      (_, t) => spark.read.parquet(s"$sfDir/$t.parquet")
    )
    val errors = outcomes.filter(_.status.startsWith("ERROR"))
    assert(errors.isEmpty, s"live failures:\n${errors.mkString("\n")}")
    // all four tables loaded and validated deviation-free
    assert(outcomes.count(_.status == "loaded") == tables.size)
    assert(outcomes.count(_.status == "validated") == tables.size)
    // the out-of-scope FK parent was skipped, not attempted
    assert(outcomes.exists(o => o.status == "skipped" && o.stmt.contains("CURRENCY")))

    // live enforcement proof: re-inserting existing keys must violate
    // the imported PRIMARY KEY
    val conn = DriverManager.getConnection(url)
    try {
      val dup = intercept[java.sql.SQLException] {
        conn.createStatement().execute("INSERT INTO TPCH.REGION SELECT * FROM TPCH.REGION")
      }
      assert(dup.getSQLState.startsWith("23"), s"expected integrity violation, got ${dup.getSQLState}")
      // and an FK child without its parent must be rejected
      val orphan = intercept[java.sql.SQLException] {
        conn
          .createStatement()
          .execute("INSERT INTO TPCH.NATION (N_NATIONKEY, N_NAME, N_REGIONKEY) VALUES (999, 'NOWHERE', 12345)")
      }
      assert(orphan.getSQLState.startsWith("23"), s"expected FK violation, got ${orphan.getSQLState}")
    } finally conn.close()
  }

  test("live key import surfaces real duplicate data and isolates the failure") {
    // The synthetic fixture's lineitem (l_orderkey, l_linenumber)
    // pairs are NOT unique (6000 rows, 4599 distinct pairs at
    // sf0.001) — exactly the situation where the dry-run path would
    // happily render an ADD PRIMARY KEY that can never hold. The live
    // loop must surface the violation from the engine AND keep every
    // other statement unaffected (per-statement outcome isolation,
    // the reference's post-load importer behavior).
    val url = "jdbc:derby:memory:graft_live_composite;create=true"
    val tabs = Seq("orders", "lineitem")
    val cols = Catalog.readParquetColumns(spark, sfDir, "tpch", tabs)
    val outcomes = LiveJdbc.execute(
      spark,
      url,
      cols,
      Movement.fixtureKeyMeta,
      (_, t) => spark.read.parquet(s"$sfDir/$t.parquet")
    )
    // the composite PK attempt fails honestly with the engine's
    // duplicate-key diagnosis...
    val pkFail = outcomes.filter(o => o.stmt.contains("PRIMARY KEY (L_ORDERKEY,L_LINENUMBER)"))
    assert(pkFail.length == 1 && pkFail.head.status.startsWith("ERROR") && pkFail.head.status.contains("duplicate key"))
    // ...while every other stage is untouched: loads, the orders PK,
    // the in-scope FK, the out-of-scope skips, and validation
    assert(outcomes.count(_.status == "loaded") == 2)
    assert(outcomes.exists(o => o.stmt.contains("PRIMARY KEY (O_ORDERKEY)") && o.status == "applied"))
    assert(outcomes.exists(o => o.stmt.contains("LINEITEM_ORDERS_FK") && o.status == "applied"))
    assert(outcomes.count(o => o.status == "skipped" && o.stmt.contains("not in scope")) == 4) // part, supplier, currency, customer
    assert(outcomes.count(_.status == "validated") == 2)
    // and the only error in the whole run is that one PK statement
    assert(outcomes.count(_.status.startsWith("ERROR")) == 1)
  }
}
