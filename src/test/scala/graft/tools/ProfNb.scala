package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage decomposition of text_nb_classifier at an arbitrary dir.
  *   sbt "Test/runMain graft.tools.ProfNb [dir]"
  */
object ProfNb {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("target/scratch/sf1")
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
    val s = spark
    import graft.Tables.load

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"-- $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warmup
    load(s, d, "documents").write.format("noop").mode("overwrite").save()

    val docs = load(s, d, "documents")
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
    val tf = docs
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    time("tf count")(println("   tf rows " + tf.count()))
    val cw = time("cw checkpoint")(
      docs.select(col("lang"), explode(col("ws")).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("c"))
        .localCheckpoint())
    println("   cw rows " + cw.count())
    val vocab = cw.groupBy("w").agg(sum("c").as("c_tot"))
    val artifact = "profnb_model"
    val model = time("model materialize")(
      graft.matview.Materializer(s).create(artifact,
        cw.select(col("lang").as("cls"), col("w"),
          round(log(col("c").cast("double") + lit(1.0)) *
            lit(1000000000.0)).cast("long").as("delta_e9"))))
    val headW = vocab.orderBy(col("c_tot").desc, col("w")).limit(1000)
      .select("w")
    val scored = tf.join(broadcast(headW), Seq("w"), "left_semi")
      .join(broadcast(model.join(broadcast(headW), Seq("w"), "left_semi")), "w")
      .unionByName(tf.join(broadcast(headW), Seq("w"), "left_anti")
        .join(model.join(broadcast(headW), Seq("w"), "left_anti"), "w"))
    time("scored noop")(
      scored.write.format("noop").mode("overwrite").save())
    val langs = Seq("de", "en", "es", "fr", "zh")
    val dCols = langs.map(l =>
      sum(when(col("cls") === l, col("tf") * col("delta_e9"))
        .otherwise(lit(0L))).as(s"d_$l"))
    val dsum = scored.groupBy("doc_id").agg(dCols.head, dCols.tail: _*)
    time("dsum noop")(
      dsum.write.format("noop").mode("overwrite").save())
    time("full key x2")(
      graft.ext.TextOps.textNbClassifier(s, d)
        .write.format("noop").mode("overwrite").save())
    time("full key again")(
      graft.ext.TextOps.textNbClassifier(s, d)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
