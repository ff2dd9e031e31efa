package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (mirrors the driver's Verify
  * session config: UTC, small shuffle-partition count).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  val sfTest = "/root/testdata/sf0.001"
}
