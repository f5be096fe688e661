package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage decomposition of dedup_simhash cost. */
object ProfSimhash {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/target/scratch/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables._

    def time(tag: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[simhash-prof] $tag: best=${ts.min}%.3f")
    }

    val sig = load(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.SimHashSig.simhash_sig(col("text")).as("sig"))

    time("1 sig only")(
      sig.write.format("noop").mode("overwrite").save())

    val chunkStructs = (0 until 8).map(c => struct(lit(c).as("chunk"),
      shiftrightunsigned(col("sig"), c * 8).bitwiseAND(lit(0xFFL)).as("cv")))
    def buckets(s0: org.apache.spark.sql.DataFrame) =
      s0.select(col("doc_id"), col("sig"),
        explode(array(chunkStructs: _*)).as("bk"))
        .select(col("doc_id"), col("sig"),
          col("bk.chunk").as("chunk"), col("bk.cv").as("cv"))

    time("2 buckets")(
      buckets(sig).write.format("noop").mode("overwrite").save())

    val sigC = sig.localCheckpoint()
    val bc = buckets(sigC)
    time("3 join count (checkpointed sig)")(
      bc.as("l").join(bc.as("r"),
        col("l.chunk") === col("r.chunk") && col("l.cv") === col("r.cv") &&
        col("l.doc_id") < col("r.doc_id") &&
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))) <= 7)
        .selectExpr("count(*)").write.format("noop").mode("overwrite").save())

    val bs = buckets(sigC).repartition(32, col("chunk"), col("cv"))
    time("4 join count shuffle-hash hint")(
      bs.as("l").join(bs.as("r").hint("shuffle_hash"),
        col("l.chunk") === col("r.chunk") && col("l.cv") === col("r.cv") &&
        col("l.doc_id") < col("r.doc_id") &&
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))) <= 7)
        .selectExpr("count(*)").write.format("noop").mode("overwrite").save())

    // single packed long key -> LongHashedRelation instead of the generic
    // UnsafeRow-keyed map
    val packed = sigC.select(col("doc_id"), col("sig"),
      explode(array((0 until 8).map(c =>
        (lit(c.toLong * 256) + shiftrightunsigned(col("sig"), c * 8)
          .bitwiseAND(lit(0xFFL))).as(s"k$c")): _*)).as("bkey"))
    time("5 join count packed long key")(
      packed.as("l").join(packed.as("r"),
        col("l.bkey") === col("r.bkey") &&
        col("l.doc_id") < col("r.doc_id") &&
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))) <= 7)
        .selectExpr("count(*)").write.format("noop").mode("overwrite").save())

    // how many raw candidate pairs are there, actually?
    val cnt = packed.as("l").join(packed.as("r"),
      col("l.bkey") === col("r.bkey") && col("l.doc_id") < col("r.doc_id"))
      .count()
    println(s"[simhash-prof] raw candidate pairs (8-bit bands): $cnt")

    // 16-bit blocks, asymmetric 1-bit multi-probe (pigeonhole: 7 errors
    // over 4 blocks -> some block has <= 1 error). Probe side emits the
    // block value + its 16 single-bit flips; index side only the exact
    // value, so a qualifying pair collides exactly once per block.
    def blockVal(b: Int) =
      shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))
    val index = sigC.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(b =>
        (lit(b.toLong << 16) + blockVal(b))): _*)).as("bkey"))
    val probes = sigC.select(col("doc_id"), col("sig"),
      explode(array((for { b <- 0 until 4; f <- -1 until 16 } yield {
        val v = if (f < 0) blockVal(b)
                else blockVal(b).bitwiseXOR(lit(1L << f))
        lit(b.toLong << 16) + v
      }): _*)).as("bkey"))
    time("6 asymmetric 16-bit multiprobe")(
      probes.as("l").join(index.as("r"),
        col("l.bkey") === col("r.bkey") &&
        col("l.doc_id") < col("r.doc_id") &&
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))) <= 7)
        .selectExpr("count(*)").write.format("noop").mode("overwrite").save())
    val cnt16 = probes.as("l").join(index.as("r"),
      col("l.bkey") === col("r.bkey") && col("l.doc_id") < col("r.doc_id"))
      .count()
    println(s"[simhash-prof] raw candidate pairs (16-bit multiprobe): $cnt16")

    spark.stop()
  }
}
