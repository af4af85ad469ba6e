package graft.tools

import graft.SparkEntry

/** Dev tool: run one registered query and print its rows as
  * tab-separated lines (deterministic order comes from the query's own
  * ORDER BY). Used for pinning golden VALUES oracles and spot-checks.
  *
  * Usage: runMain graft.tools.RunQuery <sfDir> <queryName>
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.ops.Fixtures.sessionBuilder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).collect().foreach { r =>
      println((0 until r.length).map(i => String.valueOf(r.get(i))).mkString("\t"))
    }
    spark.stop()
  }
}
