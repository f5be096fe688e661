package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

class DedupSpec extends AnyFunSuite {
  import TestSpark.{spark => tsSpark, SF => tsSF}

  test("prefix-filtered jaccard equals the inverted-index plan exactly") {
    val a = graft.ext.Dedup.dedupNgramJaccardInverted(tsSpark, tsSF).collect()
    val b = graft.ext.Dedup.dedupNgramJaccardPrefix(tsSpark, tsSF).collect()
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  import TestSpark.{spark, SF}

  private lazy val exact = Dedup.dedupNgramJaccard(spark, SF)
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  private lazy val minhash = Dedup.dedupMinhashLsh(spark, SF)
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("component labeling converges in O(log d) rounds on a long chain") {
    import tsSpark.implicits._
    // planted adversarial 64-node chain: plain min-propagation needs ~63
    // rounds (the label walks one hop per round); pointer doubling must
    // finish in O(log2 64) — allow generous slack for the +1 recurrence
    val n = 64
    val chain = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
    val edges = (chain ++ chain.map(_.swap)).toDF("src", "dst")
    val (labels, rounds) = graft.ext.Dedup.minLabelComponents(edges)
    assert(rounds <= 10, s"took $rounds rounds for a $n-chain")
    val out = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == n && out.forall(_._2 == 0L),
      s"chain not fully labeled 0: ${out.sortBy(_._1).take(10).toSeq}")
  }

  test("corpus has planted near-duplicate pairs") {
    assert(exact.nonEmpty)
  }

  test("minhash+LSH finds exactly the exact-jaccard pairs on this corpus") {
    // LSH candidates are verified with exact jaccard, so minhash ⊆ exact
    // always; at the planted j>=0.9 recall is 1 - 6e-9, so equality holds.
    assert(minhash == exact)
  }

  test("simhash banding recovers most jaccard near-dups (different measure)") {
    val sim = Dedup.dedupSimhash(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(sim.contains).toDouble / exact.size
    assert(recall >= 0.8, s"simhash recall of jaccard pairs = $recall")
  }

  test("exact dedup keeps one keeper per distinct content") {
    val df = Dedup.dedupExact(spark, SF)
    val total = graft.Tables.load(spark, SF, "documents").count()
    import org.apache.spark.sql.functions._
    val copies = df.agg(sum("n_copies")).collect().head.getLong(0)
    assert(copies == total)
  }

  test("embedding cosine pairs are symmetric-free (a < b) and above threshold") {
    val rows = Dedup.dedupEmbeddingCosine(spark, SF).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getAs[Double]("cosine") >= 0.4))
  }

  test("containment subsumes jaccard: every jaccard pair appears both ways") {
    // ix/|A| >= ix/(|A|+|B|-ix) always, so jaccard >= t implies
    // containment >= t in BOTH orientations (where |A| clears the size
    // floor) — the asymmetric operator strictly widens the symmetric one
    val jac = Dedup.dedupNgramJaccard(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val contRows = Dedup.dedupContainment(spark, SF).collect()
    val cont = contRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(contRows.forall { r =>
      val c = r.getAs[Double]("containment"); c >= 0.8 && c <= 1.0
    })
    assert(jac.forall { case (a, b) =>
      cont.contains((a, b)) && cont.contains((b, a))
    })
  }
}
