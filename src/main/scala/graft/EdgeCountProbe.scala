package graft

object EdgeCountProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, dir)
    println("[edges] lineitem rows = " + li.count())
    val e = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    val row = ext.Graph.triangleStats(e).collect()(0)
    println(s"[edges] nodes=${row.getLong(0)} edges=${row.getLong(1)} wedges=${row.getLong(2)} triangles=${row.getLong(3)}")
    spark.stop()
  }
}
