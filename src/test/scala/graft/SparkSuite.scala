package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for suites (one per suite, lazily built).
  * Uses the canonical [[GraftSession]] config so suites exercise the
  * engine posture (extensions + AQE sizing), with a small pre-coalesce
  * width — test data is tiny and AQE coalesces anyway.
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(
    cores = 4, partitions = 4, initialPartitions = 32,
    appName = getClass.getSimpleName)

  val sfDir = "/root/testdata/sf0.001"
}
