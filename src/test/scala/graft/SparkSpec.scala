package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for suites that need one. */
object TestSpark {
  lazy val spark: SparkSession = graft.ops.Fixtures
    .sessionBuilder("local[2]", "2")
    .appName("graft-tests")
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
