package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Similarity search over the `embeddings` table (`array<float>` column).
  *
  * Two paths:
  *   - [[similarityTopkBruteforce]]: exact cosine top-k — the correctness
  *     baseline. Query set x corpus join; scales as |Q| x |corpus|, which is
  *     the right plan when |Q| is small (batch scoring) — the corpus side
  *     streams through whole-stage codegen, never materializing pairs.
  *   - [[similarityAnnLsh]]: random-hyperplane LSH (Charikar, STOC 2002):
  *     8 tables x 16-bit signatures; candidates = bucket collisions; exact
  *     rerank on candidates. At 100 TB the bucket join replaces the full
  *     corpus scan per query with a shuffle keyed on (table, signature).
  *
  * Dot products run in double via `zip_with` + `aggregate` (codegen'd
  * higher-order functions, sequential fold). Scores are rounded to 9
  * decimals so ranking is identical across engines; ties break on vec_id.
  */
object Similarity {

  type Q = (SparkSession, String) => DataFrame

  private val K = 5
  private val NUM_QUERIES = 10
  // 6-bit signatures x 12 tables: sized for moderate-similarity corpora
  // (top-neighbor cosine ~0.45 here). At web scale, bits grows with
  // log2(corpus/bucket-target) and tables with the recall target.
  private val TABLES = 12
  private val BITS = 6
  private val DIM = 64

  private def norm(embedding: Column): Column = sqrt(expr(
    s"aggregate(transform(${embedding.toString}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"))

  private def dot(a: String, b: String): Column = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, x) -> acc + x)")

  /** Exact cosine top-K for the first [[NUM_QUERIES]] vectors against the
    * whole corpus. */
  def similarityTopkBruteforce(s: SparkSession, d: String): DataFrame = {
    val e = load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < NUM_QUERIES)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    val scored = broadcast(q).join(e, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot("qe", "embedding") / (col("qn") * col("nrm")), 9).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select("query_id", "neighbor_id", "rank", "score")
      .orderBy("query_id", "rank")
  }

  /** Deterministic +-1 hyperplanes from a SplitMix64 stream (public
    * algorithm; seed fixed so plans are reproducible across runs). */
  private[graft] def hyperplanes(): Array[Array[Array[Double]]] = {
    var state = 42L
    def next(): Long = {
      state += 0x9E3779B97F4A7C15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Array.fill(TABLES, BITS) {
      Array.fill(DIM)(if ((next() & 1L) == 0L) -1.0 else 1.0)
    }
  }

  /** ANN via random-hyperplane LSH; same output shape as the brute-force
    * baseline. Approximate — no SQL oracle; the test suite asserts recall
    * against [[similarityTopkBruteforce]]. */
  def similarityAnnLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planes = hyperplanes()
    val bPlanes = s.sparkContext.broadcast(planes)

    // Signature computation is per-row imperative math over a fixed-size
    // array — the one place a typed Dataset map beats an expression tree
    // (128 aggregate() expressions would defeat codegen).
    val sigs = load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, emb) =>
        val ps = bPlanes.value
        (0 until TABLES).map { t =>
          var sig = 0
          var b = 0
          while (b < BITS) {
            val plane = ps(t)(b)
            var acc = 0.0
            var i = 0
            while (i < DIM) { acc += emb(i) * plane(i); i += 1 }
            if (acc > 0) sig |= (1 << b)
            b += 1
          }
          (id, t, sig)
        }
      }
      .toDF("vec_id", "tbl", "sig")

    val qs = sigs.filter(col("vec_id") < NUM_QUERIES)
      .select(col("vec_id").as("query_id"), col("tbl"), col("sig"))
    val cand = broadcast(qs).join(sigs, Seq("tbl", "sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id")
      .distinct()

    val e = load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val q = e.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), col("nrm").as("qn"))
    val scored = cand
      .join(broadcast(q), "query_id")
      .join(e, "vec_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot("qe", "embedding") / (col("qn") * col("nrm")), 9).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select("query_id", "neighbor_id", "rank", "score")
      .orderBy("query_id", "rank")
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of K centroids (the first
    * K vectors by id — deterministic seeding; one Lloyd refinement pass
    * keeps it honest without breaking determinism), vectors assigned to
    * their nearest centroid's inverted list, queries probing the NPROBE
    * nearest lists with exact rerank. At 100 TB the inverted lists are
    * bucketed tables keyed by centroid id: a probe reads NPROBE/K of the
    * corpus instead of scanning it. Approximate — rows-only check; recall
    * vs the exact baseline is asserted in the test suite. */
  def similarityIvf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val NLISTS = 16
    val NPROBE = 4

    val e = load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))

    // deterministic seeds + one Lloyd pass, all on the driver over K-sized
    // state (centroids are tiny; the corpus never leaves the executors)
    val seed = e.orderBy("vec_id").limit(NLISTS)
      .select("embedding").as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    def assignUdf(cents: Array[Array[Double]]) = udf { (emb: Seq[Float]) =>
      var best = 0; var bestDot = Double.MinValue
      var c = 0
      while (c < cents.length) {
        var acc = 0.0; var i = 0
        val cent = cents(c)
        while (i < cent.length) { acc += emb(i) * cent(i); i += 1 }
        if (acc > bestDot) { bestDot = acc; best = c }
        c += 1
      }
      best
    }
    val assigned0 = e.withColumn("cid", assignUdf(seed)(col("embedding")))
    val refined: Array[Array[Double]] = assigned0
      .select(col("cid"), col("embedding")).as[(Int, Array[Float])]
      .collect()
      .groupBy(_._1)
      .map { case (cid, vs) =>
        val dim = vs.head._2.length
        val mean = Array.ofDim[Double](dim)
        vs.foreach(v => (0 until dim).foreach(i => mean(i) += v._2(i)))
        (0 until dim).foreach(i => mean(i) /= vs.length)
        cid -> mean
      }
      .toSeq.sortBy(_._1).map(_._2).toArray
    val lists = e.withColumn("cid", assignUdf(refined)(col("embedding")))

    // probe: rank centroids per query, take NPROBE nearest lists
    val probeUdf = udf { (emb: Seq[Float]) =>
      refined.zipWithIndex.map { case (cent, cid) =>
        var acc = 0.0; var i = 0
        while (i < cent.length) { acc += emb(i) * cent(i); i += 1 }
        (acc, cid)
      }.sortBy(-_._1).take(NPROBE).map(_._2)
    }
    val queries = lists.filter(col("vec_id") < NUM_QUERIES)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), explode(probeUdf(col("embedding"))).as("cid"))

    val scored = broadcast(queries)
      .join(lists, Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot("qe", "embedding") / (col("qn") * col("nrm")), 9).as("score"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select("query_id", "neighbor_id", "rank", "score")
      .orderBy("query_id", "rank")
  }

  val entries: Map[String, Q] = Map(
    "similarity_topk_bruteforce" -> (similarityTopkBruteforce _),
    "similarity_ann_lsh"         -> (similarityAnnLsh _),
    "similarity_ivf"             -> (similarityIvf _),
  )

  val oracles: Map[String, String] = Map(
    "similarity_topk_bruteforce" ->
      s"""SELECT query_id, neighbor_id, rank, score FROM (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |  round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 9) AS score,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |    round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 9) DESC,
         |    e.vec_id) AS INTEGER) AS rank
         |  FROM embeddings q JOIN embeddings e ON q.vec_id < $NUM_QUERIES
         |    AND e.vec_id <> q.vec_id) t
         |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin,
    // similarity_ann_lsh: approximate — rows-only check + recall test in
    // the scalatest suite.
  )
}
