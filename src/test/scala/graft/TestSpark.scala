package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object TestSpark {
  val SF = "/root/testdata/sf0.001"

  /** Relocatable scratch root for spec-owned Materializer/Snapshots state
    * (r14 ADVICE): overridable via -Dgraft.test.scratch, defaulting to
    * the JVM tmpdir — the suite no longer assumes a fixed checkout path. */
  val scratch: String = sys.props.get("graft.test.scratch")
    .getOrElse(sys.props("java.io.tmpdir").stripSuffix("/") +
      "/graft-scratch-test")

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
