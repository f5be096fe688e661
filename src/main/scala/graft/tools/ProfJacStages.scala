package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: stage breakdown of the fused prefix-filter jaccard at a given
  * corpus, plus candidate-count stats. */
object ProfJacStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-28s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def rawShingles(d: String): DataFrame =
      graft.Tables.load(spark, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ws) - 3), " +
            "i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))")).as("gram"))
        .select(col("doc_id"), xxhash64(col("gram")).as("h"))

    val g = rawShingles(sfDir).distinct()
    val sets = g.groupBy("doc_id")
      .agg(sort_array(collect_list(col("h"))).as("hs"))
    val prefix = sets.select(col("doc_id"), explode(expr(
      "slice(hs, 1, size(hs) - CAST(ceil(size(hs) * 0.8) AS INT) + 1)"))
      .as("h"))
    val cand = prefix.as("pa").join(prefix.as("pb"),
        col("pa.h") === col("pb.h") && col("pa.doc_id") < col("pb.doc_id"))
      .select(col("pa.doc_id").as("a"), col("pb.doc_id").as("b"))
      .distinct()

    time("a_raw_shingles")(noop(rawShingles(sfDir)))
    time("b_distinct")(noop(g))
    time("c_sets_groupby")(noop(sets))
    time("d_prefix_explode")(noop(prefix))
    time("e_cand_join_distinct")(noop(cand))
    time("f_full")(noop(graft.ext.Dedup.dedupNgramJaccardPrefix(spark, sfDir)))
    println(s"docs=${graft.Tables.load(spark, sfDir, "documents").count()}")
    println(s"shingle_rows=${g.count()} prefix_rows=${prefix.count()} cands=${cand.count()}")
    spark.stop()
  }
}
