package graft

/** A/B probe for the pair-generator eager-checkpoint cost on the
  * PRODUCTION paths (r9 VERDICT #2): the round-9 latch caught
  * `materialize = true` costing +0.6 s on the sample-scale recall
  * gauges (fixed there via `materialize = false`), but the registered
  * full-corpus `x_lsh_candidates` / `x_jaccard_pairs` still pay the
  * eager barriers every run. This measures both modes on the full
  * corpus, min-of-reps, so the default is set by measurement:
  *
  *  - eager (`materialize = true`): shingle/band table computed ONCE,
  *    blocks feed sizes + df-cap + both self-join legs; AQE plans the
  *    self-join from measured stats. Cost: two materialization
  *    barriers and the block write.
  *  - lazy  (`materialize = false`): no barriers; every consumer
  *    re-derives the tokenize→shingle→minhash pipeline (bands feeds 2
  *    consumers, the jaccard shingle index 4).
  *
  * Usage: runMain graft.LshCkptProbe <sfDir> [reps=3]
  */
object LshCkptProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")

    def minOf(label: String)(f: => Unit): Double = {
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }.min
      println(f"[lshab] $label%-34s $t%7.2f s (min of $reps)")
      t
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, dir)
    docs.count() // warm the scan

    minOf("lsh_candidates eager")(
      noop(ext.DedupOps.lshCandidates(docs, "doc_id", "text", materialize = true)))
    minOf("lsh_candidates lazy")(
      noop(ext.DedupOps.lshCandidates(docs, "doc_id", "text", materialize = false)))
    minOf("jaccard_pairs eager")(
      noop(ext.DedupOps.jaccardPairs(docs, "doc_id", "text", materialize = true)))
    minOf("jaccard_pairs lazy")(
      noop(ext.DedupOps.jaccardPairs(docs, "doc_id", "text", materialize = false)))
    spark.stop()
  }
}
