package graft

import org.apache.spark.sql.SparkSession

/** Profiling harness for the sf1 (10×) super-linear suspects flagged by
  * the scale bench (SCALE.md): runs each suspect standalone at both
  * scales with per-stage timing, so "which stage grew faster than the
  * data" is measured, not guessed. Usage: ProfileScale [sf01Dir sf1Dir]
  */
object ProfileScale {
  def main(args: Array[String]): Unit = {
    val sf01 = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val sf1 = if (args.length > 1) args(1) else "/tmp/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-46s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    // convergence telemetry at both scales: rounds must track component
    // diameter, not data size
    for (d <- Seq(sf01, sf1)) {
      val docs = Tables.documents(spark, d)
      val (labels, rounds) = graft.ext.DedupOps.resolveComponentsCounted(
        graft.ext.DedupOps.lshCandidates(docs, "doc_id", "text"))
      println(s"[$d] resolution: ${labels.count()} labeled docs in $rounds rounds")
    }
    {
      val chain = {
        import spark.implicits._
        (1L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      }
      val (_, chainRounds) = graft.ext.DedupOps.resolveComponentsCounted(chain)
      println(s"[chain-63] rounds: $chainRounds")
    }

    // q_pipeline_e2e r2→r3 +37% split: r2 timed with .count() (Catalyst
    // prunes the JSON extract + surrogate key to nothing), r3+ with the
    // noop sink (materializes every column). Timing both on the same
    // code isolates the honest-timing delta from any real regression.
    for (rep <- 1 to 3) {
      val e2e = graft.queries.CoreQueries.queries("q_pipeline_e2e")
      time(s"e2e noop sink  rep$rep")(
        e2e(spark, sf01).write.format("noop").mode("overwrite").save())
      time(s"e2e count()    rep$rep")(e2e(spark, sf01).count(): Unit)
    }

    for (d <- Seq(sf01, sf1); rep <- 1 to 2) {
      val docs = Tables.documents(spark, d)
      println(s"[$d] rep $rep  (input partitions: ${docs.rdd.getNumPartitions})")
      time("  qualityFilter")(
        graft.ext.Corpus.qualityFilter(docs, "doc_id", "text",
          Seq("the", "a", "of", "and", "is", "in", "to"), 20, 80, 0.02, "en")
          .write.format("noop").mode("overwrite").save())
      time("  minhashSignatures")(
        graft.ext.DedupOps.minhashSignatures(docs, "doc_id", "text")
          .write.format("noop").mode("overwrite").save())
      time("  shingles only")(
        docs.select(graft.ext.TextOps.shingles(
            org.apache.spark.sql.functions.col("text"), 3).as("sh"))
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
