package graft.tools

/** Prints registry sizes; diagnostic-only. */
object KeyCount {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"KEYS=${q.size} ORACLES=${o.size}")
    println("MISSING_ORACLE=" + (q -- o).toList.sorted.mkString(","))
    println("ORPHAN_ORACLE=" + (o -- q).toList.sorted.mkString(","))
  }
}
