package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only phase timer for the streaming cluster route (not part of
  * the library surface): breaks dedup_stream_clusters' wall time into
  * index build / per-batch probe+append / cold-start save / maintain.
  */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.ops.Fixtures.sessionBuilder("local[32]", "32").getOrCreate()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.ops.Fixtures.documents(s, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft_profile_cc")
    val idx = base.resolve("index").toString
    val mapDir = base.resolve("map").toString
    t("warm docs scan")(docs.count())
    t("index build") {
      graft.ops.Dedup.saveMinhashIndex(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
    }
    val batches = Seq(1L, 3L).map { r =>
      docs.filter(col("doc_id") % 4 === r).select("doc_id", "text")
    }
    batches.zipWithIndex.foreach { case (b, i) =>
      val bdf = t(s"batch$i collect->local")(b.localCheckpoint(true))
      val (flags, sigNew) = t(s"batch$i probe plan") {
        graft.ops.Dedup.incrementalDedupCached(bdf, "doc_id", "text", idx,
          graft.ops.Dedup.incrementalMinMatches)
      }
      val edges = t(s"batch$i flags materialize") {
        flags.select(col("new_id").as("src"), col("ref_id").as("dst")).localCheckpoint(true)
      }
      t(s"batch$i append sigs")(graft.ops.Dedup.appendSignaturesToIndex(sigNew, idx))
      sigNew.unpersist()
      if (i == 0)
        t(s"batch$i coldstart CC+save") {
          graft.ops.GraphDedup.saveClusterMap(
            graft.ops.GraphDedup.incrementComponents(edges), mapDir, 4)
        }
      else
        t(s"batch$i maintain")(graft.ops.GraphDedup.maintainClusterMap(s, mapDir, edges, 4))
    }
    t("read map")(graft.ops.GraphDedup.readClusterMap(s, mapDir).count())
    s.stop()
  }
}
