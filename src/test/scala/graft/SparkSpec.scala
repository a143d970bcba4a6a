package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session fixture: one local session per suite, sf0.001 data. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    // GRAFT_TEST_MASTER=local-cluster[2,16,4096] runs the same suites
    // against REAL executor JVMs (closure serialization, task-size and
    // broadcast classes that local[n] silently skips). Executor JVMs
    // need the compiled test/main classes on their classpath —
    // GRAFT_TEST_CLASSPATH carries `sbt "export Test/fullClasspath"`.
    val master = sys.env.getOrElse("GRAFT_TEST_MASTER", "local[4]")
    val b0 = SparkSession.builder()
      .master(master)
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val b =
      if (master.startsWith("local-cluster"))
        b0.config("spark.executor.memory", "3g")
          .config("spark.executor.extraClassPath",
            sys.env.getOrElse("GRAFT_TEST_CLASSPATH", ""))
      else b0
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.DuckAliases.register(s)
    s
  }
}
