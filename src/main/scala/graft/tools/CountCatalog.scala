package graft.tools
object CountCatalog {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"CATALOG=${q.size} ORACLES=${o.size} ROWSONLY=${(q -- o).size}")
    println("rows-only: " + (q -- o).toSeq.sorted.mkString(", "))
    val orphan = o -- q
    if (orphan.nonEmpty) println("ORPHAN ORACLES: " + orphan.mkString(", "))
  }
}
