package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: PQ codebook-geometry probe — run the parameterized
  * similarityIvfPqWith at an explicit ksub and report recall@5 vs exact
  * brute force plus per-run wall-clock, the measured companion to
  * ProfIvfGeom for the codebook dimension.
  *
  *   sbt "Test/runMain graft.tools.ProfPqGeom [dir] [ksub] [rerank] [reps]"
  */
object ProfPqGeom {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("target/scratch/sf1")
    val ksub = args.lift(1).map(_.toInt).getOrElse(64)
    val rerank = args.lift(2).map(_.toInt).getOrElse(128)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
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

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(
      graft.ext.Similarity.similarityTopkBruteforce(spark, d))

    def run(): Double = {
      val t0 = System.nanoTime()
      graft.ext.Similarity.similarityIvfPqWith(spark, d, ksub, rerank)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warmup
    val ts = (1 to reps).map(_ => run())
    val got = pairs(
      graft.ext.Similarity.similarityIvfPqWith(spark, d, ksub, rerank))
    val recall = exact.count(got.contains).toDouble / exact.size
    println(f"[profpqgeom] dir=$d ksub=$ksub rerank=$rerank recall@5=$recall%.3f " +
      f"best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
