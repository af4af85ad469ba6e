package graft.tools

import graft.SparkEntry

/** Dev tool: print the formatted physical plan of one or more
  * registered queries (plan review per the build contract — pushdown,
  * broadcast, codegen spans).
  *
  * Usage: runMain graft.tools.Explain <sfDir> <queryName> [more...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.ops.Fixtures.sessionBuilder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
