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
      // iterative decade probes (pagerank at sf100) leave each
      // iteration's now-unreferenced shuffle files on disk until a
      // driver GC lets the ContextCleaner delete them — at 1.2B-edge
      // iterations that fills the box (observed: 42 GB of blockmgr in
      // 4 min, 57 GB free) long before Spark's default 30 min periodic
      // GC. 60s keeps steady-state disk at ~2 live iterations.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "60s"))
      // SER storage-level blocks are NOT compressed by default: at sf100
      // pagerank's 1.2B-edge checkpoint that is ~25 GB of raw blocks on
      // a 55 GB-free box (died "No space left on device", stage 16) vs
      // ~8 GB under lz4 — the knob a deployment sets whenever it uses
      // *_SER levels
      .config("spark.rdd.compress", "true")
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
