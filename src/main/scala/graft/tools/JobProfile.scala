package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev tool (not part of the driver contract): run one registered
  * query and print every Spark JOB it launched — duration, task count,
  * and the call site — so the fixed-cost floor of multi-job operators
  * (the streaming replays above all) can be attributed line by line.
  * `runMain graft.tools.JobProfile <sfDir> <name> [reps]`
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val s = graft.ops.Fixtures.sessionBuilder("local[32]", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // warm: JVM + codegen + parquet footers
    try graft.SparkEntry.entry(s).count()
    catch { case _: Throwable => () }

    final case class J(id: Int, var desc: String, var t0: Long, var t1: Long, var tasks: Int)
    val jobs = mutable.LinkedHashMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties.getProperty("spark.job.description"))
          .orElse(Option(e.properties.getProperty("callSite.short")))
          .getOrElse("?")
        jobs.synchronized {
          jobs(e.jobId) = J(e.jobId, d, e.time, e.time, e.stageInfos.map(_.numTasks).sum)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
    }

    val fn = graft.SparkEntry.queries(name)
    fn(s, sfDir).count() // warm run (builds memoized demo state)
    (1 to reps).foreach { r =>
      jobs.synchronized(jobs.clear())
      s.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(s, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      s.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // let listener events drain
      val snap = jobs.synchronized(jobs.values.toVector)
      println(f"== $name rep $r wall=$wall%.3f s jobs=${snap.size} jobtime=${snap.map(j => j.t1 - j.t0).sum / 1e3}%.3f s")
      val base = snap.map(_.t0).minOption.getOrElse(0L)
      snap.sortBy(_.t0).foreach { j =>
        val d1 = j.desc.linesIterator.toSeq.lastOption.getOrElse("?")
        println(
          f"  +${(j.t0 - base) / 1e3}%7.3f ${(j.t1 - j.t0) / 1e3}%7.3f s tasks=${j.tasks}%4d  ${d1.take(90)}"
        )
      }
    }
    s.stop()
  }
}
