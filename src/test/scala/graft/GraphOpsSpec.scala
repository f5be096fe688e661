package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** Planted-graph properties for the co-purchase graph analytics
  * (triangle counting, bounded BFS) and the chi-square contingency key. */
class GraphOpsSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  test("compact-forward triangle counts equal brute-force enumeration") {
    import spark.implicits._
    // deterministic sparse random graph: 24 nodes, ~25% edge density —
    // enough triangles, hubs, and degree ties to exercise orientation
    val n = 24
    val pairs = for {
      u <- 0L until n; v <- (u + 1) until n
      // non-linear hash — a linear-mod generator admits no triangles
      if math.floorMod(scala.util.hashing.MurmurHash3.caseClassHash((u, v)), 4) == 0
    } yield (u, v)
    val got = Dedup.triangleCounts(pairs.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val es = pairs.toSet
    val tris = for {
      (x, y) <- pairs; z <- (y + 1) until n
      if es.contains((y, z)) && es.contains((x, z))
    } yield (x, y, z)
    assert(tris.nonEmpty, "fixture graph has no triangles")
    val want = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == want)
  }

  test("sketched triangles: deterministic and one-sided (edges ⊆ exact)") {
    // 1) determinism: two runs produce identical counts (the sketch is a
    //    pure function of the data — no RNG, so the oracle can replay it)
    val run1 = Dedup.graphTriangleSketch(spark, SF)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val run2 = Dedup.graphTriangleSketch(spark, SF)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run1 == run2)
    // 2) the ONE-SIDED contract: sampled co-occurrence never exceeds
    //    true co-occurrence and both relations use the same >= 4
    //    threshold, so every sketched edge must be an exact-graph edge
    //    (zero false edges — the property that makes every reported
    //    triangle a true triangle)
    val exactEdges = Dedup.coPurchaseEdges(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sketchEdges = Dedup.coPurchaseEdgesSketch(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sketchEdges.nonEmpty, "sketch produced an empty edge set")
    val false_ = sketchEdges -- exactEdges
    assert(false_.isEmpty,
      s"${false_.size} sketched edges are not exact-graph edges: " +
        false_.take(5).mkString(", "))
  }

  test("bounded BFS walks a chain level by level and stops at the bound") {
    import spark.implicits._
    // 0 -> 1 -> ... -> 9 (undirected): from seed 0, dist = node id,
    // nodes past maxDepth absent
    val chain = (0L until 9L).map(i => (i, i + 1))
    val edges = (chain ++ chain.map(_.swap)).toDF("src", "dst")
    val got = Dedup.bfsLevels(edges, seed = 0L, maxDepth = 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == (0 to 6).map(i => i.toLong -> i).toMap)
  }

  test("co-purchase BFS distances are consistent with the edge relation") {
    val edges = Dedup.coPurchaseEdges(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dist = Dedup.recursiveCteReach(spark, SF).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dist.values.exists(_ > 0), "BFS never left the seed")
    // every edge's endpoints differ by at most one level when both are
    // reached — the defining BFS invariant
    edges.foreach { case (u, v) =>
      (dist.get(u), dist.get(v)) match {
        case (Some(du), Some(dv)) =>
          assert(math.abs(du - dv) <= 1, s"edge ($u,$v): $du vs $dv")
        case (Some(du), None) => assert(du == 6, s"$u reached at $du but $v unreached")
        case (None, Some(dv)) => assert(dv == 6, s"$v reached at $dv but $u unreached")
        case _ => ()
      }
    }
  }

  test("chi-square cells partition the orders and chi2 folds the cells") {
    val rows = graft.queries.Extras.statChiSquare(spark, SF).collect()
    val nOrders = Tables.load(spark, SF, "orders").count()
    assert(rows.map(_.getLong(2)).sum == nOrders)
    val chi2 = rows.head.getDouble(5)
    assert(rows.forall(_.getDouble(5) == chi2))
    val manual = BigDecimal(
      rows.sortBy(r => (r.getString(0), r.getString(1)))
        .map(_.getDouble(4)).foldLeft(0.0)(_ + _))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(manual == chi2)
    assert(rows.head.getLong(6) == 8L) // (5 priorities - 1) x (3 statuses - 1)
  }
}
