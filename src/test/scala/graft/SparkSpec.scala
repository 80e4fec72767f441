package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — Spark
  * startup dominates test time otherwise). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.builder(
    appName = "graft-test", master = "local[4]", shufflePartitions = 4
  ).getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfSmoke = "/root/testdata/sf0.001"
}
