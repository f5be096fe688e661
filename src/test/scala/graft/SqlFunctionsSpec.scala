package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native kernels registered as SQL functions via GraftExtensions:
  * every `graft_*` call from `spark.sql` must equal the Scala-API column
  * it registers, and literal-only parameters must fail with a clear
  * error rather than a buffer-shape surprise. */
class SqlFunctionsSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  // getOrCreate() reuses an existing default session and silently ignores
  // withExtensions — force a genuinely new session, restore after
  private var saved: Option[SparkSession] = None

  private lazy val spark: SparkSession = {
    saved = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-sqlfn-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    saved.foreach { s =>
      SparkSession.setDefaultSession(s)
      SparkSession.setActiveSession(s)
    }
    super.afterAll()
  }

  test("scalar graft_* SQL calls equal their Scala-API columns") {
    val docs = Tables.load(spark, TestSpark.SF, "documents")
    docs.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_rolling_hash(text) AS rh,
        |  graft_simhash_sig(text) AS sh,
        |  graft_mix64(doc_id, 7) AS mx,
        |  graft_word_gram_hashes(text, 3) AS wg
        |FROM sqlfn_docs""".stripMargin)
    val viaApi = docs.select(col("doc_id"),
      graft.functions.RollingHash.rolling_hash(col("text")).as("rh"),
      graft.functions.SimHashSig.simhash_sig(col("text")).as("sh"),
      graft.functions.Mix64.mix64(col("doc_id"), 7L).as("mx"),
      graft.functions.WordGramHashes.word_gram_hashes(col("text"), 3)
        .as("wg"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("array kernels compose in SQL: dot product and sorted intersect") {
    val emb = Tables.load(spark, TestSpark.SF, "embeddings")
    emb.createOrReplaceTempView("sqlfn_emb")
    val row = spark.sql(
      """SELECT graft_vector_dot(a.embedding, b.embedding) AS d,
        |  graft_sorted_intersect_size(
        |    array(1L, 3L, 5L), array(3L, 4L, 5L)) AS ix
        |FROM sqlfn_emb a JOIN sqlfn_emb b
        |ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin).head()
    val expected = emb.filter(col("vec_id") === 0)
      .crossJoin(emb.filter(col("vec_id") === 1)
        .select(col("embedding").as("e2")))
      .select(graft.functions.VectorDot
        .vector_dot(col("embedding"), col("e2"))).head().getDouble(0)
    assert(row.getDouble(0) == expected)
    assert(row.getInt(1) == 2)
  }

  test("aggregate graft_* SQL calls equal their Scala-API aggregates") {
    val docs = Tables.load(spark, TestSpark.SF, "documents").limit(50)
    docs.createOrReplaceTempView("sqlfn_agg_docs")
    val viaSql = spark.sql(
      """SELECT graft_minhash(graft_rolling_hash(text), 16) AS mh,
        |  graft_top_k(CAST(n_chars AS DOUBLE), doc_id, 3) AS tk
        |FROM sqlfn_agg_docs""".stripMargin)
    val viaApi = docs.agg(
      graft.functions.MinHashAgg
        .minhash(graft.functions.RollingHash.rolling_hash(col("text")), 16)
        .as("mh"),
      graft.functions.TopKAgg
        .top_k(col("n_chars").cast("double"), col("doc_id"), 3).as("tk"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("non-literal shape parameters fail with the registration's error") {
    // register the view here too — this test must not depend on the
    // scalar test having run first (isolated -z runs)
    Tables.load(spark, TestSpark.SF, "documents")
      .createOrReplaceTempView("sqlfn_docs")
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_minhash(doc_id, doc_id) FROM sqlfn_docs")
        .collect()
    }
    assert(ex.getMessage.contains("integer literal") ||
      Option(ex.getCause).exists(_.getMessage.contains("integer literal")))
  }
}
