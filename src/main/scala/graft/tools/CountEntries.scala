package graft.tools

/** Dev utility: print the entry/oracle counts the driver will see. */
object CountEntries {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size} no_oracle=${(q -- o).toSeq.sorted.mkString(",")}")
    val orphans = (o -- q).toSeq.sorted
    if (orphans.nonEmpty) println(s"ORACLE WITHOUT QUERY: ${orphans.mkString(",")}")
  }
}
