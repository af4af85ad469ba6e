package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.hadoop.fs.Path

/** In-place compaction for append-maintained parquet relations (the
  * persisted dedup/ANN indexes): every append adds one file per batch
  * (per partition dir for partitioned layouts), so a long-lived
  * probe→append loop accretes unbounded file counts — the small-files
  * problem the initial partitioned save explicitly guards against.
  *
  * Rewrite: read → repartition (by the partition column, or to a fixed
  * file count) → write to a staging dir → swap. The swap is
  * delete+rename through the Hadoop FileSystem, so it works on any FS
  * the index lives on; like any overwrite of a live table it runs
  * under the lake's usual maintenance coordination (a concurrent probe
  * during the swap window would see a missing dir — the same contract
  * as INSERT OVERWRITE). Values are untouched, so probe results are
  * bit-identical before and after (IncrementalDedupSpec pins this).
  */
object Compaction {

  private val commitMarker = "_graft_commit"

  /** Roll a crashed compaction forward or back. The swap in
    * [[compact]] commits by dropping `_graft_commit` into the staged
    * dir AFTER its write completes and BEFORE the live dir is deleted,
    * so every crash point is decidable from the two dirs alone:
    * staged-with-marker = the new generation is complete, finish the
    * swap (the live dir, if still present, is the old generation);
    * staged-without-marker = the staged write died midway, the live
    * dir is intact, delete the garbage; a marker INSIDE the live dir =
    * the swap finished but the cosmetic marker delete didn't (parquet
    * readers ignore underscore files — removed lazily here). Called at
    * every [[compact]] entry; long-lived probe→append loops run
    * compaction on a cadence, which makes this their recovery hook.
    */
  def recover(spark: SparkSession, path: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val staged = new Path(path + "__compacting")
    if (fs.exists(staged)) {
      if (fs.exists(new Path(staged, commitMarker))) {
        fs.delete(new Path(path), true)
        if (!fs.rename(staged, new Path(path)))
          throw new java.io.IOException(s"compaction recovery failed: rename $staged -> $path")
        fs.delete(new Path(path, commitMarker), false)
      } else fs.delete(staged, true)
    } else {
      val leftover = new Path(path, commitMarker)
      if (fs.exists(leftover)) fs.delete(leftover, false)
    }
  }

  /** Crash-safe whole-dir replacement: recover any interrupted swap,
    * have the caller write the NEW generation into the staging dir,
    * then marker-commit and swap. The building block under [[compact]]
    * and any state relation maintained by full rewrite (aggregate-
    * sized streaming state, where a rewrite is as cheap as a merge).
    */
  def replaceWith(spark: SparkSession, path: String)(write: String => Unit): Unit = {
    recover(spark, path)
    val staged = path + "__compacting"
    write(staged)
    val p = new Path(path)
    val s = new Path(staged)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(new Path(staged, commitMarker), true).close()
    fs.delete(p, true)
    if (!fs.rename(s, p))
      throw new java.io.IOException(s"swap failed: rename $staged -> $path")
    fs.delete(new Path(path, commitMarker), false)
  }

  /** Rewrite `path` with a bounded file count: one file per partition
    * dir when `partitionCol` is set, else `targetPartitions` files.
    * At corpus scale pick `targetPartitions` from target bytes per
    * file (total bytes / 128 MiB), not a fixed count. Crash-safe: the
    * staged generation is marker-committed before the live dir is
    * touched ([[recover]] finishes an interrupted swap).
    */
  def compact(
      spark: SparkSession,
      path: String,
      partitionCol: Option[String],
      targetPartitions: Int
  ): Unit = {
    // recover FIRST — a crashed swap may have left no live dir to read
    recover(spark, path)
    val df = spark.read.parquet(path)
    replaceWith(spark, path) { staged =>
      partitionCol match {
        case Some(c) =>
          df.repartition(col(c)).write.mode("overwrite").partitionBy(c).parquet(staged)
        case None =>
          df.repartition(targetPartitions).write.mode("overwrite").parquet(staged)
      }
    }
  }

  /** Small FS text-file helpers for state markers that live NEXT TO a
    * parquet relation (underscore-prefixed names are invisible to the
    * parquet reader).
    */
  def writeTextFile(spark: SparkSession, path: String, content: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
  }

  def readTextFile(spark: SparkSession, path: String): Option[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** Recursive FS-level directory copy (Hadoop FileUtil — any FS the
    * relations live on): how a replay/demo run takes a PRIVATE mutable
    * copy of a shared index without recomputing it.
    */
  def copyDir(spark: SparkSession, from: String, to: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val src = new Path(from)
    val dst = new Path(to)
    val fs = src.getFileSystem(conf)
    if (!org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, conf))
      throw new java.io.IOException(s"dir copy failed: $from -> $to")
  }
}
