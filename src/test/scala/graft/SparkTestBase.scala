package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Sessions

/** Shared session for all suites (one JVM per forked test run). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("graft-test")
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
