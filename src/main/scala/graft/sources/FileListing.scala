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
}
