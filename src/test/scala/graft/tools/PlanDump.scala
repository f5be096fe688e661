package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only: dump `.explain("formatted")` for registered keys to files —
  * the optimization-round evidence trail (plans/rNN/<key>_{before,after}.txt).
  *
  *   sbt "Test/runMain graft.tools.PlanDump <outDir> <suffix> <key> [key...]"
  *
  * Uses the bench session shape (local[32], AQE on, 8m advisory) so the
  * dumped plan is the one the bench runs; the formatted explain is the
  * pre-execution adaptive plan (isFinalPlan=false) — join strategies,
  * Exchange placement, PushedFilters and ReadSchema are all visible.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val keys = args.drop(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { key =>
      val df = graft.SparkEntry.queries(key)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${key}_$suffix.txt"), txt)
      println(s"[plandump] wrote $outDir/${key}_$suffix.txt")
    }
    spark.stop()
  }
}
