package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time one registered key against an arbitrary table dir.
  *
  *   sbt "runMain graft.tools.ProfKey <key> [dir] [reps]"
  *
  * Mirrors Bench's measurement discipline (noop sink, warmup, best-of-N)
  * so one-off optimization probes are comparable to the round bench.
  */
object ProfKey {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // decade-scaled shuffle width: at sf100 (600M-row lineitem) 32
    // partitions put ~4.7M rows in each shuffled-hash build side —
    // hundreds of MB per concurrent task, which no fixed heap absorbs.
    // A deployment sizes spark.sql.shuffle.partitions to the data (the
    // knob a 1000-executor cluster sets in the thousands); this override
    // is that knob for one-box decade probes.
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(key)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // PROFKEY_WARMUP=0 skips the warmup run: for multi-minute decade
    // probes (pagerank at sf100 ~25 min/run) JIT warmup is noise and a
    // throwaway full run doubles the probe's wall-clock budget
    if (sys.env.getOrElse("PROFKEY_WARMUP", "1") != "0") run()
    val ts = (1 to reps).map(_ => run())
    println(f"[profkey] $key @ $dir: best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    if (sys.env.contains("PROFKEY_EXPLAIN")) {
      // Execute THROUGH the df's own QueryExecution (not a write — the
      // write path plans a separate QE), so the printed plan is the FINAL
      // adaptive plan: isFinalPlan=true, ReusedExchange and AQE-replanned
      // joins visible. foreachPartition on the QE's RDD executes without
      // materializing corpus-sized results on the driver.
      val df = graft.SparkEntry.queries(key)(spark, dir)
      df.queryExecution.toRdd.foreachPartition(_ => ())
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
