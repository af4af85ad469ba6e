package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.schema.MessageTypeParser

/** Driver-side SCALAR parquet I/O (guide §1.2: fix the fixed-cost
  * floor once the job shape is right).
  *
  * The search-index meta/ameta/fmeta scalars and the meta-increment
  * ledgers are one-to-few-ROW files living in a per-micro-batch hot
  * loop (the streaming applies) and in every from-index probe's
  * prologue (readMeta). Writing or reading them through a Spark job
  * spends a full job launch — plan, schedule, task, commit — to move
  * under a hundred bytes; at 4-6 such scalar jobs per micro-batch that
  * job-launch floor, not data, dominates streaming maintenance. These
  * helpers move the same bytes with parquet-mr directly from the
  * driver: the files keep their names, schema and format, so every
  * existing Spark/DuckDB read path (compaction, index_stats, specs)
  * reads them unchanged — only the job count drops. Scalar-sized rows
  * ONLY: anything batch- or corpus-sized stays a Spark write.
  */
object ScalarParquet {

  /** Values must be Long or String, matching the schema DDL order. */
  def write(
      conf: Configuration,
      file: Path,
      messageSchema: String,
      rows: Seq[Seq[Any]]
  ): Unit = {
    val schema = MessageTypeParser.parseMessageType(messageSchema)
    val c = new Configuration(conf)
    GroupWriteSupport.setSchema(schema, c)
    val w = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(file, c))
      .withConf(c)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val f = new SimpleGroupFactory(schema)
    try rows.foreach { r =>
      val g = f.newGroup()
      r.zipWithIndex.foreach {
        case (v: Long, i)   => g.add(i, v)
        case (v: String, i) => g.add(i, v)
        case (v, _) =>
          throw new IllegalArgumentException(s"scalar parquet: unsupported value $v")
      }
      w.write(g)
    } finally w.close()
  }

  /** Stream every row of every `*.parquet` file under `dir` (or of the
    * single file at `dir` if it is a file) through `f`. Driver-side:
    * callers must only point this at scalar-sized relations.
    */
  def foreachRow(conf: Configuration, fs: FileSystem, dir: Path)(f: Group => Unit): Unit = {
    val files =
      if (fs.isFile(dir)) Array(dir)
      else
        Option(fs.globStatus(new Path(dir, "*.parquet")))
          .getOrElse(Array.empty)
          .map(_.getPath)
          .sortBy(_.toString)
    files.foreach { p =>
      val r = ParquetReader
        .builder(new GroupReadSupport(), p)
        .withConf(conf)
        .build()
      try {
        var g = r.read()
        while (g != null) { f(g); g = r.read() }
      } finally r.close()
    }
  }

  /** Write `rows` as the single file `<dir>/<name>` via a same-volume
    * temp + rename (the crash contract every ledger/meta writer keeps:
    * a half-written file is never visible under its final name).
    */
  def writeAtomic(
      conf: Configuration,
      fs: FileSystem,
      dir: Path,
      name: String,
      messageSchema: String,
      rows: Seq[Seq[Any]]
  ): Unit = {
    fs.mkdirs(dir)
    val tmp = new Path(dir, s"_tmp_$name")
    if (fs.exists(tmp)) fs.delete(tmp, false)
    write(conf, tmp, messageSchema, rows)
    val dest = new Path(dir, name)
    if (fs.exists(dest)) fs.delete(dest, false)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"scalar parquet: rename $tmp -> $dest failed")
  }

  /** Overwrite `dir` with the single-file relation `scalar-0.parquet`
    * — the direct twin of `df.coalesce(1).write.mode("overwrite")`
    * for scalar rows (same read surface: a dir of parquet files).
    */
  def overwriteDir(
      conf: Configuration,
      fs: FileSystem,
      dir: Path,
      messageSchema: String,
      rows: Seq[Seq[Any]]
  ): Unit = {
    val tmp = new Path(dir.getParent, s"_tmp_${dir.getName}")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    fs.mkdirs(tmp)
    write(conf, new Path(tmp, "scalar-0.parquet"), messageSchema, rows)
    if (fs.exists(dir)) fs.delete(dir, true)
    if (!fs.rename(tmp, dir))
      throw new java.io.IOException(s"scalar parquet: rename $tmp -> $dir failed")
  }
}
