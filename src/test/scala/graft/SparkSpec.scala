package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared spark session + testdata helpers for all suites. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = Sessions.local(4, getClass.getSimpleName)
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = { /* one JVM per forked suite run */ }
}
