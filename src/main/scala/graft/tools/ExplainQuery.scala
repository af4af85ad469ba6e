package graft.tools

/** Dev tool: print the formatted physical plan of registered queries.
  * `runMain graft.tools.ExplainQuery <sfDir> <name> [<name>...]`
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val s = graft.ops.Fixtures.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      println(s"===== $name =====")
      graft.SparkEntry.queries(name)(s, sfDir).explain("formatted")
    }
    s.stop()
  }
}
