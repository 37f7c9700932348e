package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for all suites (mirrors the reference's
  * single shared session in `AdamTestBase.scala:28-30`). */
object SharedSpark {
  lazy val spark: SparkSession =
    graft.core.GraftSession.builder("local[4]", 4).appName("graft-test").getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = {
    val s = SharedSpark.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val Epsilon = 1e-4 // reference AdamTestBase.scala:35
}
