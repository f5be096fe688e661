package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: stage breakdown of dedup_minhash_lsh at the 10x corpus —
  * which of (shingle stream, signature groupBy, band join, verification)
  * owns the wall-clock, and what the MinHashAgg update loop costs vs the
  * composed codegen form. */
object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val tenx = graft.matview.Materializer.defaultScratch + "/sf10x"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", tenx)
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
      println(f"$tag%-28s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    def rawShingles(d: String): DataFrame =
      graft.Tables.load(spark, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ws) - 3), " +
            "i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))")).as("gram"))
        .select(col("doc_id"), xxhash64(col("gram")).as("h"))

    import graft.functions.{MinHashAgg, Mix64}

    // stage 0: just the shingle stream (scan + explode + hash, no shuffle)
    time("shingle_stream")(rawShingles(sfDir))
    // stage 1a: signature only (one-pass aggregate)
    time("sig_only_onepass")(rawShingles(sfDir).groupBy("doc_id")
      .agg(MinHashAgg.minhash(col("h"), 64).as("sig")))
    // stage 1b: signature only, composed 64 codegen min columns
    val composed = (0 until 64).map(i =>
      min(Mix64.mix64(col("h"), MinHashAgg.GOLDEN * i)).as(s"m$i"))
    time("sig_only_composed")(rawShingles(sfDir).groupBy("doc_id")
      .agg(composed.head, composed.tail: _*))
    // stage 1c: sets only
    time("sets_only")(rawShingles(sfDir).groupBy("doc_id")
      .agg(collect_set(col("h")).as("hs")))
    // stage 1d: the shared groupBy as registered (sig + sets)
    time("sig_plus_sets")(rawShingles(sfDir).groupBy("doc_id")
      .agg(MinHashAgg.minhash(col("h"), 64).as("sig"),
        collect_set(col("h")).as("hs")))
    // full operator
    time("full_lsh")(graft.ext.Dedup.dedupMinhashLsh(spark, sfDir))

    // ---- variant: word-hash combine, no gram string materialization ----
    // hash each word ONCE, then the gram hash is xxhash64 over the three
    // word hashes (24 fixed bytes) instead of xxhash64 over a freshly
    // concatenated ~20-byte gram string per window
    def wordHashShingles(d: String): DataFrame =
      graft.Tables.load(spark, d, "documents")
        .select(col("doc_id"),
          expr("transform(split(text, ' '), w -> xxhash64(w))").as("hw"))
        .filter(size(col("hw")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(hw) - 3), " +
            "i -> xxhash64(hw[i], hw[i+1], hw[i+2]))")).as("h"))

    def lshOver(stream: DataFrame, checkpoint: Boolean = false): DataFrame = {
      val grouped0 = stream.groupBy("doc_id")
        .agg(MinHashAgg.minhash(col("h"), 64).as("sig"),
          collect_set(col("h")).as("hs"))
      val grouped = if (checkpoint) grouped0.localCheckpoint() else grouped0
      val bandStructs = (0 until 16).map { b =>
        val cols = (0 until 4).map(r => element_at(col("sig"), b * 4 + r + 1))
        struct(lit(b).as("band"), xxhash64(cols :+ lit(b): _*).as("bh"))
      }
      val buckets = grouped.select(col("doc_id"),
        explode(array(bandStructs: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
      val cand = buckets.as("l").join(buckets.as("r"),
          col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
        .distinct()
      val sets = grouped.select(col("doc_id"), col("hs"))
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

    def nativeShingles(d: String): DataFrame =
      graft.Tables.load(spark, d, "documents")
        .select(col("doc_id"), explode(
          graft.functions.WordGramHashes.word_gram_hashes(col("text"), 3)).as("h"))

    time("stream_wordhash")(wordHashShingles(sfDir))
    time("full_lsh_wordhash")(lshOver(wordHashShingles(sfDir)))
    time("stream_native")(nativeShingles(sfDir))
    time("full_lsh_native")(lshOver(nativeShingles(sfDir)))
    time("sig_sets_native")(nativeShingles(sfDir).groupBy("doc_id")
      .agg(MinHashAgg.minhash(col("h"), 64).as("sig"),
        collect_set(col("h")).as("hs")))
    time("sig_only_native")(nativeShingles(sfDir).groupBy("doc_id")
      .agg(MinHashAgg.minhash(col("h"), 64).as("sig")))
    time("sets_only_native")(nativeShingles(sfDir).groupBy("doc_id")
      .agg(collect_set(col("h")).as("hs")))
    time("full_lsh_ckpt")(lshOver(nativeShingles(sfDir), checkpoint = true))

    // ---- variant: single-long band key + sorted-set merge-walk verify ----
    // (a) bh already folds the band index into the hash, so joining on bh
    //     alone is a one-long-key join (dense LongHashedRelation; the
    //     simhash trick); a cross-band 2^-64 false collision only adds a
    //     candidate that exact verification rejects.
    // (b) sort the verify sets once at build; then ONE merge-walk
    //     sorted_intersect_size replaces TWO array_intersect hash kernels.
    def lshTuned(stream: DataFrame, longKey: Boolean, sortedVerify: Boolean)
        : DataFrame = {
      val hsCol = if (sortedVerify) sort_array(collect_set(col("h")))
                  else collect_set(col("h"))
      val grouped = stream.groupBy("doc_id")
        .agg(MinHashAgg.minhash(col("h"), 64).as("sig"), hsCol.as("hs"))
        .localCheckpoint()
      val bandStructs = (0 until 16).map { b =>
        val cols = (0 until 4).map(r => element_at(col("sig"), b * 4 + r + 1))
        struct(lit(b).as("band"), xxhash64(cols :+ lit(b): _*).as("bh"))
      }
      val buckets0 = grouped.select(col("doc_id"),
        explode(array(bandStructs: _*)).as("bk"))
      val buckets =
        if (longKey) buckets0.select(col("doc_id"), col("bk.bh").as("bh"))
        else buckets0.select(col("doc_id"), col("bk.band").as("band"),
          col("bk.bh").as("bh"))
      val joinCond =
        if (longKey) col("l.bh") === col("r.bh") && col("l.doc_id") < col("r.doc_id")
        else col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id")
      val cand = buckets.as("l").join(buckets.as("r"), joinCond)
        .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
        .distinct()
      val sets = grouped.select(col("doc_id"), col("hs"))
      val withSets = cand
        .join(sets.as("sa"), col("a") === col("sa.doc_id"))
        .join(sets.as("sb"), col("b") === col("sb.doc_id"))
      val ix =
        if (sortedVerify)
          graft.functions.SortedIntersectSize
            .sorted_intersect_size(col("sa.hs"), col("sb.hs"))
        else size(array_intersect(col("sa.hs"), col("sb.hs")))
      withSets
        .select(col("a"), col("b"), ix.as("ix"),
          size(col("sa.hs")).as("na"), size(col("sb.hs")).as("nb"))
        .select(col("a"), col("b"),
          (col("ix") / (col("na") + col("nb") - col("ix"))).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
        .orderBy("a", "b")
    }
    time("tuned_longkey")(lshTuned(nativeShingles(sfDir), longKey = true,
      sortedVerify = false))
    time("tuned_sortedset")(lshTuned(nativeShingles(sfDir), longKey = false,
      sortedVerify = true))
    time("tuned_both")(lshTuned(nativeShingles(sfDir), longKey = true,
      sortedVerify = true))
    val tuned = lshTuned(nativeShingles(sfDir), longKey = true, sortedVerify = true)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val cur = graft.ext.Dedup.dedupMinhashLsh(spark, sfDir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wh = lshOver(wordHashShingles(sfDir))
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nat = lshOver(nativeShingles(sfDir))
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"pairs_identical=${cur == wh} cur=${cur.size} wh=${wh.size}")
    println(s"native_identical=${cur == nat} nat=${nat.size}")
    println(s"tuned_identical=${cur == tuned} tuned=${tuned.size}")
    spark.stop()
  }
}
