package graft

import org.apache.spark.sql.SparkSession

/** Names the scaling regime of the embedding near-dup family (r15
  * registry-wide sf1 sweep: x_semantic_dedup and x_embed_neardup are
  * the suite's top ratios at ~9× for 10× data — everything else is
  * further below linear). The question is whether that ~linear-looking
  * growth is PLAN cost (bad: a pair join degrading toward n²) or
  * OUTPUT cost (expected: MakeScale's ≤0.01-nudged copies make every
  * copy a near-dup of its source, so true near-dup PAIRS — the
  * result — grow faster than rows). Prints rows, LSH-band candidate
  * pairs, and confirmed τ-pairs per dir: if pairs/row grows while
  * candidates stay band-bounded, runtime tracks the RESULT, which is
  * the data's property, not the plan's.
  *
  * Usage: graft.NearDupScaleProbe [dir1] [dir2] ...
  */
object NearDupScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // configs: the registry's demo bands (16 planes, r=4 → 16 buckets
    // per band) vs the corpus-sized spelling
    // ([[ext.Similarity.sizedRowsPerBand]], the scaladoc rule as API) —
    // same τ, so the pair-set delta IS the recall cost
    dirs.foreach { d =>
      val emb = Tables.embeddings(spark, d)
      val rows = emb.count()
      val r = ext.Similarity.sizedRowsPerBand(rows)
      Seq(("demo_r4", 16, 4), (s"sized_r$r", 4 * r, r)).foreach {
        case (tag, nPlanes, rpb)
          // expected candidates b·n²/2^r (uniform-bucket floor): above
          // the budget the config IS the finding — print the prediction
          // instead of grinding the disk (no silent skip). The formula
          // is validated where both configs ran: sf0.1→sf1 demo bands
          // measured 100× candidate growth for 10× rows.
          if (nPlanes / rpb).toDouble * rows * rows /
             math.pow(2, rpb) / 2 > 2e8 =>
          println(s"""{"probe":"neardup_scale","dir":"$d","cfg":"$tag",""" +
            s""""rows":$rows,"skipped":"predicted ~${
              f"${(nPlanes / rpb).toDouble * rows * rows / math.pow(2, rpb) / 2}%.2e"
            } band candidates exceeds the 2e8 probe budget"}""")
        case (tag, nPlanes, rpb) =>
          val bands = ext.Similarity.signBitBands(emb, "vec_id", "embedding",
            ext.Similarity.hyperplanes(nPlanes, 64), rpb)
          val cands = bands.as("a").join(bands.as("b"),
              org.apache.spark.sql.functions.expr(
                "a.band_idx = b.band_idx AND a.band_key = b.band_key " +
                  "AND a.vec_id < b.vec_id"))
            .selectExpr("a.vec_id AS vec_a", "b.vec_id AS vec_b")
            .distinct().count()
          val t0 = System.nanoTime()
          val pairs = ext.Similarity.cosineNearDupLsh(
            emb, "vec_id", "embedding", 0.4, nPlanes, rpb, 64).count()
          val secs = (System.nanoTime() - t0) / 1e9
          println(s"""{"probe":"neardup_scale","dir":"$d","cfg":"$tag",""" +
            s""""rows":$rows,"band_candidates":$cands,"tau_pairs":$pairs,""" +
            s""""pairs_per_row":${f"${pairs.toDouble / rows}%.2f"},""" +
            s""""confirm_s":${f"$secs%.2f"}}""")
      }
    }
    spark.stop()
  }
}
