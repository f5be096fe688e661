package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: list every bench-tier key whose physical plan contains a
  * WindowExec with an empty partition spec (the "No Partition Defined"
  * warning source). */
object ProfGlobalWin {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE off: AdaptiveSparkPlanExec hides its subtree from collect
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // args after the dir: explicit key list (e.g. the tools.Plans set);
    // default = the bench tiers
    val keys =
      if (args.length > 1) args.drop(1).toSeq
      else graft.Bench.headline ++ Seq(
        "dedup_ngram_jaccard", "dedup_containment", "dedup_simhash",
        "dedup_minhash_lsh", "agg_count_distinct", "similarity_ann_lsh",
        "similarity_ivf", "text_bm25", "text_contamination",
        "events_funnel", "events_retention")
    keys.distinct.foreach { k =>
      try {
        val plan = graft.SparkEntry.queries(k)(spark, dir)
          .queryExecution.executedPlan
        val n = plan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
              if w.partitionSpec.isEmpty => w
        }.size
        if (n > 0) println(s"GLOBALWIN $k: $n")
      } catch { case e: Throwable => println(s"ERR $k: ${e.getMessage}") }
    }
    println("scan done")
    spark.stop()
  }
}
