package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval scoring — the BM25 family, spelled so the score is
  * EXACT integer arithmetic end to end (the PageRank discipline: a
  * classically-float algorithm restated with floor division so any
  * engine reproduces it bit for bit).
  *
  * Two deliberate departures from textbook BM25 (Robertson–Spärck
  * Jones), both documented as the engine's contract:
  *  - **rational idf**: the textbook weight is `ln((N−df+0.5)/(df+0.5))`;
  *    this engine uses the RATIO itself, floor-scaled:
  *    `idf_s = ((2(N−df)+1)·scale) div (2df+1)` — a monotone per-term
  *    transform of the same quantity (per-term rankings are identical;
  *    cross-term mixing weights rare terms more aggressively than the
  *    log form). The ln is exactly what the repo's determinism rule
  *    bans from oracle-checked scores: a last-ulp libm difference at a
  *    floor boundary would flip a scaled score (`HllDistinct` carries
  *    a measured-slack proof to keep its single ln; a per-term ln here
  *    would need that proof per corpus).
  *  - **exact-rational tf weight**: with k1 = 6/5 and b = 3/4, the
  *    textbook `tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))` multiplied
  *    through by `10·TL` (TL = total tokens, avgdl = TL/N) is
  *    `22·tf·TL / (10·TL·tf + 3·TL + 9·dl·N)` — integers throughout.
  *
  * Per-term contribution = `(idf_s · 22·tf·TL) div (10·TL·tf + 3·TL +
  * 9·dl·N)`; doc score = Σ contributions (integer sum — order-free).
  * Magnitudes: the product is bounded by `idf_s·22·tfmax·TL`; with the
  * default scale=1000 it fits a BIGINT up to ~10⁹ total tokens. Past
  * that, widen to DECIMAL(38) or drop `scale` — the structure is
  * unchanged.
  *
  * Scale shape: one token explode (map-only), a terms-filtered
  * aggregation (postings for the QUERY terms only — the explode output
  * is cut to matching tokens before any shuffle), broadcast term
  * stats, one doc-length join, and a TakeOrdered top-k. Only documents
  * containing ≥1 query term are candidates (posting-list semantics);
  * at warehouse scale the token explode amortizes into a STORED
  * postings table partitioned by term bucket (the `x_ann_ivf_stored`
  * pattern) and the probe prunes partitions.
  */
object Retrieval {

  /** Top-k documents by the exact-integer BM25 variant for a fixed
    * query term set. Returns (idCol, bm25_scaled) ordered by
    * (score desc, id) with deterministic ties.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, scale: Long = 1000L): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val id = col(idCol)
    val tok = docs.select(id, explode(TextOps.tokens(col(textCol))).as("token"))
    val dl = tok.groupBy(id).agg(count(lit(1)).as("dl"))
    // corpus stats as a 1-row broadcast scalar bound (A2 pattern)
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tl"))
    val tf = tok.filter(col("token").isin(terms: _*))
      .groupBy(id, col("token")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(dfT), "token")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("idf_s",
        expr(s"((2 * (n_docs - df) + 1) * $scale) div (2 * df + 1)"))
      .withColumn("contrib",
        expr("(idf_s * 22 * tf * tl) div (10 * tl * tf + 3 * tl + 9 * dl * n_docs)"))
    contrib.groupBy(id)
      .agg(sum(col("contrib")).as("bm25_scaled"))
      .orderBy(col("bm25_scaled").desc, id)
      .limit(k)
  }
}
