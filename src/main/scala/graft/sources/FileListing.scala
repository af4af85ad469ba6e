package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Object-store / filesystem listing as a table-generating function —
  * the Spark analog of the reference's S3/Azure listing UDTFs
  * (s3_to_exasol.sql:4-73, azure_blob_storage_to_exasol.sql:4-34):
  * EMITS (file, last_modified) with glob filtering. Pagination is the
  * filesystem connector's concern (Hadoop FS abstracts S3A/ABFS/...);
  * fnmatch filtering maps to the glob pattern.
  *
  * Listing output is file-count-sized; it feeds FileStateSync for
  * incremental state and PartitionPlanner for batch packing by size
  * (the reference's `parallel_connections` file batching).
  */
object FileListing {

  final case class ListedFile(file_name: String, size_bytes: Long, last_modified: Long)

  def list(spark: SparkSession, dirGlob: String): Seq[ListedFile] = {
    val path = new Path(dirGlob)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(path)).getOrElse(Array.empty)
    statuses.toIndexedSeq
      .filter(_.isFile)
      .map(st => ListedFile(st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_.file_name)
  }

  def listDf(spark: SparkSession, dirGlob: String): DataFrame = {
    import spark.implicits._
    list(spark, dirGlob).toDF()
  }

  /** Paged listing through the filesystem's RemoteIterator — the
    * Spark analog of the reference's continuation-token loop
    * (s3_to_exasol.sql:44-72). The iterator fetches LIST pages lazily
    * from the store (S3A: one LIST call per ~1000 keys), so a
    * million-object bucket never materializes in driver memory at
    * once — unlike globStatus, which is fine for directory-sized
    * listings but not for bucket-sized ones. Each emitted page holds
    * at most `pageSize` files.
    *
    * `pattern` is an fnmatch-style glob applied to the file name
    * (the reference's folder_name+filter_string match); directory
    * placeholder keys never appear because only file statuses are
    * iterated (the reference's endswith('/') guard). With
    * `generateUrls` the fully-qualified URI is emitted instead of the
    * bare name — the connector-auth analog of the reference's
    * presigned URLs (auth travels in the FS connector configuration,
    * not baked into the URL, which has no offline equivalent).
    */
  def listPaged(
      spark: SparkSession,
      dir: String,
      pattern: String = "*",
      pageSize: Int = 1000,
      generateUrls: Boolean = false
  ): Iterator[Seq[ListedFile]] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matcher = java.nio.file.FileSystems.getDefault.getPathMatcher(s"glob:$pattern")
    val it = fs.listFiles(path, false)
    new Iterator[Seq[ListedFile]] {
      def hasNext: Boolean = it.hasNext
      def next(): Seq[ListedFile] = {
        val page = scala.collection.mutable.ArrayBuffer.empty[ListedFile]
        while (it.hasNext && page.size < pageSize) {
          val st = it.next()
          if (matcher.matches(java.nio.file.Paths.get(st.getPath.getName))) {
            val name = if (generateUrls) st.getPath.toUri.toString else st.getPath.getName
            page += ListedFile(name, st.getLen, st.getModificationTime)
          }
        }
        page.toSeq
      }
    }.filter(_.nonEmpty)
  }
}
