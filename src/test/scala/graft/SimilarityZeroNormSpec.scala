package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The zero-norm embedding contract (r12 VERDICT item 3), pinned with
  * planted zero vectors: a zero vector has no direction, cosine against
  * it is 0/0 = NaN — TopKAgg skips NaN while a ROW_NUMBER oracle ranks
  * it first, so without a contract the engine and oracle silently
  * diverge on the first real corpus carrying one. The contract
  * (Similarity.norm doc): zero-norm vectors are EXCLUDED from all
  * cosine scoring (query and neighbor side) on both engines; the
  * contrastive key keeps its pair structure and defines the score as
  * NULL instead. Fixture: 600 deterministic vectors with id 3 (inside
  * the NUM_QUERIES=10 query range) and id 300 planted all-zero.
  */
class SimilarityZeroNormSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val ZEROS = Set(3L, 300L)

  private lazy val dir: String = {
    val d = graft.matview.Materializer.defaultScratch + "/zn_fixture"
    val rows = (0 until 600).map { id =>
      val emb =
        if (ZEROS(id.toLong)) Array.fill(64)(0.0f)
        else Array.tabulate(64) { i =>
          // deterministic, sign-mixed, never all-zero
          (((id.toLong * 64 + i) * 2654435761L % 1999L) - 999L).toFloat / 999f
        }
      (id.toLong, emb, id % 10)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def run(key: String) = SparkEntry.queries(key)(spark, dir)

  test("ANN keys exclude zero-norm vectors as query AND neighbor, " +
      "and emit no NaN score") {
    for (key <- Seq("similarity_topk_bruteforce", "similarity_ann_lsh",
        "similarity_ivf", "similarity_ivf_pq", "similarity_ann_quantized")) {
      val rows = run(key).collect()
      assert(rows.nonEmpty, key)
      assert(!rows.exists(r => ZEROS(r.getAs[Long]("query_id"))),
        s"$key scored a zero-norm QUERY")
      assert(!rows.exists(r => ZEROS(r.getAs[Long]("neighbor_id"))),
        s"$key returned a zero-norm NEIGHBOR")
      assert(!rows.exists(r => r.getAs[Double]("score").isNaN),
        s"$key emitted a NaN score")
    }
  }

  test("embedding near-dup verification excludes zero-norm vectors " +
      "(Spark's NaN >= t is TRUE — the filter is what keeps them out)") {
    val rows = run("dedup_embedding_cosine").collect()
    assert(!rows.exists(r =>
      ZEROS(r.getAs[Long]("a")) || ZEROS(r.getAs[Long]("b"))))
    assert(!rows.exists(r => r.getAs[Double]("cosine").isNaN))
  }

  test("semantic dedup keeps zero-norm members in the OUTPUT (nothing " +
      "is similar to a direction-free vector) but never pair-scores them") {
    val rows = run("dedup_semantic").collect()
    val byId = rows.map(r =>
      r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("max_sim_lower"), r.getAs[Boolean]("kept"))).toMap
    assert(rows.length == 600) // every member emitted, zero-norm included
    for (z <- ZEROS) {
      assert(byId(z) == ((-1.0, true)),
        s"zero-norm member $z must report no similar neighbor")
    }
    assert(!rows.exists(r => r.getAs[Double]("max_sim_lower").isNaN))
  }

  test("contrastive pairs keep their structure; a pair touching a " +
      "zero-norm vector carries a NULL cosine, never NaN") {
    val rows = run("corpus_contrastive_pairs").collect()
    val touching = rows.filter(r =>
      ZEROS(r.getAs[Long]("anchor_id")) || ZEROS(r.getAs[Long]("pair_id")))
    assert(touching.nonEmpty, "fixture must produce pairs touching a zero")
    assert(touching.forall(_.isNullAt(4)),
      "zero-norm pair cosine must be NULL (the defined score)")
    assert(!rows.exists(r => !r.isNullAt(4) &&
      r.getAs[Double]("cosine").isNaN))
  }
}
