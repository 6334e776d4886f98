package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up dataset generator: replicates the driver testdata N× with
  * consistent key offsets, for bench-only scale runs (`BENCH_sf1.json`).
  * Correctness always runs on the driver's own parquet; this data is for
  * measuring how each query's runtime scales, so the synthesis is chosen
  * to model NATURAL growth (10× new data), not duplication artifacts:
  *
  *  - every foreign key is offset by the same per-copy delta, so join
  *    fan-outs and group cardinalities scale the way real data would
  *    (10× customers each with their original order count — not one
  *    customer with 10× orders);
  *  - fixed-cardinality dims (region, nation) are NOT replicated, same
  *    as TPC-H scaling;
  *  - document text is word-salted per copy ("w" → "w c3"-style suffix
  *    on every word), so each copy contributes NEW shingles: per-shingle
  *    document frequency stays constant and the inverted-index join cost
  *    (Σ df²) grows ~linearly, as it does when real new content arrives.
  *    The opposite regime — verbatim copies, where every df multiplies
  *    and Σ df² grows ~quadratically — is deliberately covered by
  *    ScaleSmoke's copy-salted corpus and bounded by `maxShingleDf`;
  *  - embeddings get a small deterministic per-copy perturbation, so
  *    near-dup pair counts grow with data instead of collapsing every
  *    copy family into one exact-dup cluster;
  *  - events.ts passes through with whatever physical type the source
  *    dir uses (int64 nanos in early driver rounds, TIMESTAMP_NTZ micros
  *    currently) — `Tables.normalizeTs` type-dispatches at read time, so
  *    generated dirs work identically either way.
  *
  * Usage: MakeScale <srcSfDir> <outDir> [copies=10]
  */
object MakeScale {
  /** Offset between copies — far above any base key (max base key is
    * l_orderkey ≈ 6·10⁵ at sf0.1), so copy key-spaces never collide. */
  private val Off = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(name: String)(copy: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val scaled = (0 until copies).map(i => copy(base, i)).reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[makescale] $name: ${copies}x written")
    }
    def offset(df: DataFrame, keys: Seq[String], i: Int): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * Off)))

    // fixed-cardinality dims: copy through once, unscaled (TPC-H keeps
    // region/nation constant across scale factors; nationkey refs from
    // every customer/supplier copy stay valid)
    for (dim <- Seq("region", "nation")) {
      spark.read.parquet(s"$src/$dim.parquet")
        .write.mode("overwrite").parquet(s"$out/$dim.parquet")
      println(s"[makescale] $dim: copied (fixed-cardinality dim)")
    }

    replicate("customer")((df, i) => offset(df, Seq("c_custkey"), i))
    replicate("supplier")((df, i) => offset(df, Seq("s_suppkey"), i))
    replicate("part")((df, i) => offset(df, Seq("p_partkey"), i))
    replicate("orders")((df, i) => offset(df, Seq("o_orderkey", "o_custkey"), i))
    replicate("lineitem")((df, i) =>
      offset(df, Seq("l_orderkey", "l_partkey", "l_suppkey"), i))
    // ts passes through untouched in whatever type it was scanned as —
    // Tables.normalizeTs reads every form this can write back
    replicate("events")((df, i) => offset(df, Seq("event_id", "user_id"), i))

    replicate("documents") { (df, i) =>
      val salted =
        if (i == 0) df // copy 0 stays byte-identical to the base corpus
        else df
          .withColumn("text", regexp_replace(col("text"), "(\\w+)", s"$$1c$i"))
          .withColumn("n_chars", length(col("text")))
      offset(salted, Seq("doc_id"), i)
    }

    replicate("embeddings") { (df, i) =>
      if (i == 0) df // copy 0 stays byte-identical to the base corpus,
      else {        // mirroring the documents branch — 1x-vs-10x runs compare like-for-like
        // deterministic per-(copy, dim) nudge ≤0.01 — copies stay near
        // their original direction but are not exactly collinear
        val pert = Array.tabulate(64)(d => math.sin(i * 64.0 + d) * 0.01)
        offset(df, Seq("vec_id"), i).withColumn("embedding",
          zip_with(col("embedding"), typedLit(pert.toSeq),
            (x, p) => (x + p).cast("float")))
      }
    }

    spark.stop()
  }
}
