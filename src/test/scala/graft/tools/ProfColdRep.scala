package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: isolate the PAGE-CACHE component of a key's slow-first-rep
  * shape (r11 VERDICT item 4, events_attribution sf10 [79.2, 20.6] with
  * clean brackets). ProfKey's fresh-JVM rep 1 conflates JIT/codegen
  * warmup with cache state; this probe warms the JVM ON THE KEY first,
  * then times reps in three states within the same JVM:
  *
  *   warm      — immediately after the warmup run (bench steady state)
  *   dropped   — after sync + `echo 3 > /proc/sys/vm/drop_caches`
  *               (the "preceding keys evicted the tier's parquet" state)
  *   rewarmed  — the rep right after the dropped one (recovery check)
  *
  *   sbt "Test/runMain graft.tools.ProfColdRep <key> <dir>"  (needs root)
  */
object ProfColdRep {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val dir = args.lift(1).getOrElse("target/scratch/sf10")
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
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(key)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def dropCaches(): Unit = {
      val rc = new ProcessBuilder("sh", "-c",
        "sync && echo 3 > /proc/sys/vm/drop_caches").inheritIO().start().waitFor()
      require(rc == 0, "drop_caches failed (not root?)")
    }
    run() // JVM + codegen warmup on the key itself
    val warm = (1 to 2).map(_ => run())
    dropCaches()
    val dropped = run()
    val rewarmed = run()
    println(f"[coldrep] $key @ $dir: warm=${warm.map(t => f"$t%.2f").mkString(",")} " +
      f"dropped=$dropped%.2f rewarmed=$rewarmed%.2f " +
      f"cache_tax=${dropped - warm.min}%.2f")
    spark.stop()
  }
}
