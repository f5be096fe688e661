package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: inverted-index self-join vs prefix-filtered candidates for
  * the exact n-gram Jaccard dedup. */
object ProfJac {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-24s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    def rawShingles(d: String): DataFrame =
      graft.Tables.load(spark, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ws) - 3), " +
            "i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))")).as("gram"))
        .select(col("doc_id"), xxhash64(col("gram")).as("h"))

    def prefixJac(d: String): DataFrame = {
      val g = rawShingles(d).distinct()
      val n = g.groupBy("doc_id").agg(count(lit(1)).as("cnt"))
      val freq = g.groupBy("h").agg(count(lit(1)).as("df"))
      val ranked = g.join(freq, "h")
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df"), col("h"))))
        .join(n, "doc_id")
        .filter(col("rn") <= col("cnt") - ceil(col("cnt") * 0.8) + 1)
        .select("doc_id", "h")
      val cand = ranked.as("pa").join(ranked.as("pb"),
          col("pa.h") === col("pb.h") && col("pa.doc_id") < col("pb.doc_id"))
        .select(col("pa.doc_id").as("a"), col("pb.doc_id").as("b"))
        .distinct()
      val sets = g.groupBy("doc_id").agg(collect_set(col("h")).as("hs"))
      cand
        .join(sets.as("sa"), col("a") === col("sa.doc_id"))
        .join(sets.as("sb"), col("b") === col("sb.doc_id"))
        .select(col("a"), col("b"),
          (size(array_intersect(col("sa.hs"), col("sb.hs"))) /
            (size(col("sa.hs")) + size(col("sb.hs")) -
              size(array_intersect(col("sa.hs"), col("sb.hs"))))).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
        .orderBy("a", "b")
    }

    // hash-order prefix: same theorem (any consistent global order), no
    // document-frequency pass — two fewer shuffles, fatter posting lists
    def prefixHashOrder(d: String): DataFrame = {
      val g = rawShingles(d).distinct()
      val n = g.groupBy("doc_id").agg(count(lit(1)).as("cnt"))
      val ranked = g
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("h"))))
        .join(n, "doc_id")
        .filter(col("rn") <= col("cnt") - ceil(col("cnt") * 0.8) + 1)
        .select("doc_id", "h")
      val cand = ranked.as("pa").join(ranked.as("pb"),
          col("pa.h") === col("pb.h") && col("pa.doc_id") < col("pb.doc_id"))
        .select(col("pa.doc_id").as("a"), col("pb.doc_id").as("b"))
        .distinct()
      val sets = g.groupBy("doc_id").agg(collect_set(col("h")).as("hs"))
      cand
        .join(sets.as("sa"), col("a") === col("sa.doc_id"))
        .join(sets.as("sb"), col("b") === col("sb.doc_id"))
        .select(col("a"), col("b"),
          (size(array_intersect(col("sa.hs"), col("sb.hs"))) /
            (size(col("sa.hs")) + size(col("sb.hs")) -
              size(array_intersect(col("sa.hs"), col("sb.hs"))))).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
        .orderBy("a", "b")
    }

    // fused: ONE groupBy yields both the sorted shingle set (verification)
    // and the hash-order prefix (candidate generation) — no window, no
    // size join
    def prefixFused(d: String): DataFrame = {
      val g = rawShingles(d).distinct()
      val sets = g.groupBy("doc_id")
        .agg(sort_array(collect_list(col("h"))).as("hs"))
      val prefix = sets.select(col("doc_id"), explode(expr(
        "slice(hs, 1, size(hs) - CAST(ceil(size(hs) * 0.8) AS INT) + 1)"))
        .as("h"))
      val cand = prefix.as("pa").join(prefix.as("pb"),
          col("pa.h") === col("pb.h") && col("pa.doc_id") < col("pb.doc_id"))
        .select(col("pa.doc_id").as("a"), col("pb.doc_id").as("b"))
        .distinct()
      cand
        .join(sets.as("sa"), col("a") === col("sa.doc_id"))
        .join(sets.as("sb"), col("b") === col("sb.doc_id"))
        .select(col("a"), col("b"),
          (size(array_intersect(col("sa.hs"), col("sb.hs"))) /
            (size(col("sa.hs")) + size(col("sb.hs")) -
              size(array_intersect(col("sa.hs"), col("sb.hs"))))).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
        .orderBy("a", "b")
    }

    // v2: one shuffle for the per-doc set (array_distinct folded into the
    // groupBy), PPJoin length + positional filters pruning candidates
    // before the distinct/verify (t = 4/5 throughout, integer arithmetic)
    def prefixV2(d: String): DataFrame = {
      val sets = rawShingles(d).groupBy("doc_id")
        .agg(sort_array(array_distinct(collect_list(col("h")))).as("hs"))
        .select(col("doc_id"), col("hs"), size(col("hs")).as("sz"))
      val prefix = sets.select(col("doc_id"), col("sz"),
          posexplode(expr(
            "slice(hs, 1, size(hs) - CAST(ceil(size(hs) * 0.8) AS INT) + 1)")))
        .withColumnRenamed("col", "h")
      val cand = prefix.as("pa").join(prefix.as("pb"),
          col("pa.h") === col("pb.h") && col("pa.doc_id") < col("pb.doc_id") &&
          lit(5) * least(col("pa.sz"), col("pb.sz")) >=
            lit(4) * greatest(col("pa.sz"), col("pb.sz")) &&
          lit(9) * (lit(1) + least(col("pa.sz") - col("pa.pos") - 1,
            col("pb.sz") - col("pb.pos") - 1)) >=
            lit(4) * (col("pa.sz") + col("pb.sz")))
        .select(col("pa.doc_id").as("a"), col("pb.doc_id").as("b"))
        .distinct()
      cand
        .join(sets.as("sa"), col("a") === col("sa.doc_id"))
        .join(sets.as("sb"), col("b") === col("sb.doc_id"))
        .select(col("a"), col("b"),
          (size(array_intersect(col("sa.hs"), col("sb.hs"))) /
            (size(col("sa.hs")) + size(col("sb.hs")) -
              size(array_intersect(col("sa.hs"), col("sb.hs"))))).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
        .orderBy("a", "b")
    }

    time("current_inverted")(graft.ext.Dedup.dedupNgramJaccardInverted(spark, sfDir))
    time("prefix_rarefirst")(prefixJac(sfDir))
    time("prefix_hashorder")(prefixHashOrder(sfDir))
    time("prefix_fused")(prefixFused(sfDir))
    time("prefix_v2")(prefixV2(sfDir))
    val a = graft.ext.Dedup.dedupNgramJaccardInverted(spark, sfDir).collect()
    val b = prefixJac(sfDir).collect()
    val c = prefixHashOrder(sfDir).collect()
    val f = prefixFused(sfDir).collect()
    val v2 = prefixV2(sfDir).collect()
    println(s"values_identical=${a.sameElements(b) && a.sameElements(c) && a.sameElements(f)}")
    println(s"v2_identical=${a.sameElements(v2)}")
    spark.stop()
  }
}
