package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.shims

object CkptShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, dir)
    li.count()

    def info(label: String, e: DataFrame): Unit = {
      val rdd = e.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd }.head
      val st = spark.sparkContext.getRDDStorageInfo.find(_.id == rdd.id)
      println(s"[shape] $label parts=${rdd.getNumPartitions} " +
        st.map(i => s"mem=${i.memSize} disk=${i.diskSize} cached=${i.numCachedPartitions}").getOrElse("nostorage") +
        s" stats=${e.queryExecution.optimizedPlan.stats}")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    val e1 = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    info("stats", shims.checkpointWithStats(e1))
    val e2 = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    val lz = e2.localCheckpoint(eager = false); lz.count()
    info("lazy ", lz)
    spark.stop()
  }
}
