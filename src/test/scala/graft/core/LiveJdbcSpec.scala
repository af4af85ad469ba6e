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
}
