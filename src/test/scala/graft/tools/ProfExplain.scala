package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the explain fixture's per-node metrics (modes, rows)
  * to author/debug the explain_plan / explain_analyze goldens. */
object ProfExplain {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val df = graft.queries.Lifecycle.explainFixture(spark, dir)
    df.collect()
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    df.queryExecution.executedPlan.foreach {
      case a: BaseAggregateExec =>
        println(s"AGG ${a.getClass.getSimpleName} modes=" +
          a.aggregateExpressions.map(_.mode).mkString(",") +
          s" rows=${a.metrics.get("numOutputRows").map(_.value)}")
      case p =>
        println(s"NODE ${p.getClass.getSimpleName} " +
          s"rows=${p.metrics.get("numOutputRows").map(_.value)}")
    }
    spark.stop()
  }
}
