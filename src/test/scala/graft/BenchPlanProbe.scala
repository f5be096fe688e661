package graft

import org.scalatest.funsuite.AnyFunSuite

/** Dev probe (kept: cheap, documents plan shape at bench SF). */
class BenchPlanProbe extends AnyFunSuite {
  test("5-way join plan shape at sf0.1") {
    val spark = TestSpark.spark
    val df = graft.queries.Relational.joinNatural5Way(spark, "/root/testdata/sf0.1")
    val qe = df.queryExecution
    df.collect()
    val p = qe.executedPlan.toString
    info("shuffles=" + "Exchange".r.findAllIn(p).length)
    info("broadcasts=" + "BroadcastHashJoin".r.findAllIn(p).length)
    info("sortmerge=" + "SortMergeJoin".r.findAllIn(p).length)
    assert(p.contains("BroadcastHashJoin"))
  }
}
