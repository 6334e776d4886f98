package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Numeric

/** Corpus-preparation operators for training-data pipelines: dataset
  * splitting, vocabulary statistics, inverse-document-frequency term
  * weighting, composite quality gating.
  *
  * Scale design: the split and the quality gate are pure per-row
  * projections (no shuffle, whole-stage codegen). Vocabulary and tf-idf
  * are one keyed aggregation each on (token) / (doc, token) with
  * map-side partial aggregation; the global top-k is
  * TakeOrderedAndProject (per-partition top-k then a single tiny merge,
  * never a full sort); the per-doc top-k is a window over each doc's
  * already-small term list. No driver-side iteration anywhere.
  */
object Corpus {

  /** Deterministic 0-255 bucket from the first md5 byte of the id —
    * reproducible across engines, runs, and partitionings (md5, not
    * murmur/xxhash, for oracle parity; same rationale as the MinHash
    * family). The SQL text is valid in both Spark and DuckDB, so the
    * Spark expression and the oracle share one definition.
    */
  def splitBucketSql(idExpr: String): String =
    s"CAST((instr('0123456789abcdef', substr(md5(CAST($idExpr AS STRING)), 1, 1)) - 1) * 16" +
      s" + instr('0123456789abcdef', substr(md5(CAST($idExpr AS STRING)), 2, 1)) - 1 AS BIGINT)"

  def splitBucket(idCol: String): Column = expr(splitBucketSql(idCol))

  /** Train/val/test assignment by hash bucket: stable under corpus
    * growth (a document's split never changes when others are added) —
    * the property random() splits lack. Defaults ≈ 80/10/10
    * (204/26/26 of 256).
    */
  def assignSplit(df: DataFrame, idCol: String,
                  trainUpper: Int = 204, valUpper: Int = 230): DataFrame =
    df.withColumn("bucket", splitBucket(idCol))
      .withColumn("split",
        when(col("bucket") < trainUpper, "train")
          .when(col("bucket") < valUpper, "val")
          .otherwise("test"))

  /** Top-k vocabulary by document frequency (distinct per doc), with a
    * deterministic (df desc, token asc) tie-break.
    */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(explode(array_distinct(TextOps.tokens(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token").asc)
      .limit(k)

  /** Per-document top-k terms by tf/df weighting (the log-free tf-idf
    * variant: same ranking as tf·idf for a fixed doc since log is
    * monotone, but a single exact IEEE division instead of a libm log
    * whose last ulp varies across engines). Emits (doc, token, tf, df,
    * score) for the winners.
    */
  def tfidfTop(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("token").asc)
    tf.join(dfreq, Seq("token"))
      .withColumn("score", Numeric.roundBin(col("tf").cast("double") / col("df"), 6))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("score"))
  }

  /** Collocation extraction: top-k bigrams by LIFT — the log-free PMI
    * ranking (lift = N·c(ab) / (c(a)·c(b)); PMI is log(lift), and log is
    * monotone, so the top-k by lift IS the top-k by PMI — without the
    * libm log whose last ulp differs across engines). Two keyed counts
    * (bigrams, unigrams), both reduced map-side to vocabulary-sized
    * tables, the unigram side broadcast twice; final top-k is a
    * TakeOrdered, never a full sort. Numerator/denominator are computed
    * as one IEEE multiply each plus one division — deterministic at any
    * parallelism.
    */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
                   minCount: Long, k: Int): DataFrame = {
    val toks = docs.select(explode(TextOps.tokens(col(textCol))).as("token"))
    val uni = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("n_total"))
    val bi = docs
      .select(explode(TextOps.shingles(col(textCol), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    bi
      .withColumn("__w1", split(col("bigram"), " ").getItem(0))
      .withColumn("__w2", split(col("bigram"), " ").getItem(1))
      .join(broadcast(uni.select(col("token").as("__w1"), col("c").as("c_a"))), Seq("__w1"))
      .join(broadcast(uni.select(col("token").as("__w2"), col("c").as("c_b"))), Seq("__w2"))
      .crossJoin(broadcast(total))
      .select(col("bigram"), col("c_ab"), col("c_a"), col("c_b"),
        Numeric.roundBin(
          (col("c_ab").cast("double") * col("n_total")) /
            (col("c_a").cast("double") * col("c_b")), 6).as("lift"))
      .orderBy(col("lift").desc, col("bigram").asc)
      .limit(k)
  }

  /** Per-document mean token rarity: avg over the doc's tokens of
    * N_total/count(token) — inverse unigram frequency, the log-free
    * surprisal proxy (CCNet-style LM quality scoring without the libm
    * `ln` whose last ulp differs across engines; each rarity is ONE
    * exact IEEE division and the mean is the order-independent
    * scaled-integer average). High score = rare-token-heavy doc.
    *
    * Plan shape: unigram counts are a groupBy over the token stream
    * (map-side partials reduce it to one row per distinct token per
    * partition), then joined BROADCAST back to the stream — the token
    * stream itself never shuffles, and the only full shuffle is the
    * final per-doc groupBy. Word-level vocabularies are ~10⁶–10⁷ rows
    * even at corpus scale (Heaps' law), well inside broadcast range; for
    * an unbounded key space (e.g. raw n-grams) drop the broadcast hint
    * and let AQE pick the exchange.
    */
  def rarityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
    val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("n_total"))
    toks.join(broadcast(freq), Seq("token"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        Numeric.scaledAvg(col("n_total").cast("double") / col("cnt"), 4)
          .as("mean_rarity"))
  }

  /** Deterministic stratified sample: k rows per stratum, chosen by
    * md5-of-id order (engine-portable, reproducible at any parallelism —
    * the `ORDER BY rand()` sample that isn't). Trailing id tie-break
    * keeps the order total.
    *
    * Two-phase exact top-k for skew safety: a single per-stratum window
    * would serialize a dominant stratum onto one task (a corpus that is
    * 90% one language puts 90% of 100 TB through one window). Phase 1
    * ranks within (stratum, hash-salt bucket) — every bucket holds each
    * stratum's true top-k candidates for its slice — phase 2 re-ranks
    * the ≤ k·buckets survivors per stratum. Result identical to the
    * one-window formulation (so the oracle stays the single QUALIFY),
    * but no task ever sees more than a bucket's rows + k·buckets.
    *
    * Note: Spark ≥3.5 infers a map-side partial `WindowGroupLimit` from
    * the plain `row_number() <= k` filter (pinned in PlanSpec on
    * x_tfidf_top), which bounds the shuffled rows to k per key per map
    * task — the single-window form is scale-safe on modern Spark. The
    * explicit two-phase remains for rank patterns the inference doesn't
    * cover and as the engine-independent statement of the technique.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       k: Int, buckets: Int = 32): DataFrame = {
    val order = Seq(md5(col(idCol).cast("string")), col(idCol))
    val w1 = Window
      .partitionBy(col(stratumCol), pmod(xxhash64(col(idCol)), lit(buckets.toLong)))
      .orderBy(order: _*)
    val w2 = Window.partitionBy(col(stratumCol)).orderBy(order: _*)
    df.withColumn("__rn1", row_number().over(w1)).filter(col("__rn1") <= k)
      .withColumn("__rn2", row_number().over(w2)).filter(col("__rn2") <= k)
      .drop("__rn1", "__rn2")
  }

  /** Domain-MIXTURE sampling: per-stratum quotas (the "20% code, 30%
    * web, …" data-mixing step every pretraining run tunes), drawn in
    * deterministic md5-of-id order like [[stratifiedSample]] — a
    * stratum's draw is stable under growth of OTHER strata, so remixing
    * one domain never reshuffles the rest. Same two-phase skew-safe
    * top-k (phase 1 caps at the max quota per salt bucket; phase 2
    * applies each stratum's own quota).
    */
  def mixtureSample(df: DataFrame, stratumCol: String, idCol: String,
                    quotas: Map[String, Int], defaultQuota: Int,
                    buckets: Int = 32): DataFrame = {
    require(quotas.nonEmpty && (quotas.values.min >= 0) && defaultQuota >= 0)
    val kMax = (quotas.values.toSeq :+ defaultQuota).max
    val quota = coalesce(element_at(typedLit(quotas), col(stratumCol)), lit(defaultQuota))
    val order = Seq(md5(col(idCol).cast("string")), col(idCol))
    val w1 = Window
      .partitionBy(col(stratumCol), pmod(xxhash64(col(idCol)), lit(buckets.toLong)))
      .orderBy(order: _*)
    val w2 = Window.partitionBy(col(stratumCol)).orderBy(order: _*)
    df.withColumn("__rn1", row_number().over(w1)).filter(col("__rn1") <= kMax)
      .withColumn("__rn2", row_number().over(w2)).filter(col("__rn2") <= quota)
      .drop("__rn1", "__rn2")
  }

  /** Train/test DECONTAMINATION: for each eval-split document, how many
    * of its distinct word n-grams appear anywhere in the training split
    * — the standard n-gram-overlap contamination check run before
    * training on any scraped corpus. Returns (id, n_contaminated) for
    * eval docs with at least one hit.
    *
    * Scale shape: the training side collapses to its distinct n-gram
    * vocabulary FIRST (one keyed aggregation — at 100 TB this is the
    * vocabulary table, not the corpus), then one inverted-index
    * equi-join on the n-gram against the (much smaller) eval side and a
    * count per eval doc. No cross product anywhere.
    */
  def contamination(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int): DataFrame = {
    val trainVocab = DedupOps.shingleIndex(train, idCol, textCol, n)
      .select(col("shingle")).distinct()
    DedupOps.shingleIndex(eval, idCol, textCol, n)
      .join(trainVocab, Seq("shingle"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_contaminated"))
  }

  /** [[contamination]]'s mirror at production scale: which TRAINING
    * documents contain eval-set n-grams (the docs a pipeline actually
    * drops), with a Bloom-filter prefilter so the decision never shuffles
    * the big side. Returns (id, n_contaminated) for train docs sharing ≥1
    * distinct n-gram with the eval split — EXACT results: the Bloom pass
    * only prunes, the equi-join on survivors confirms.
    *
    * Scale shape: the eval vocabulary (small side) is aggregated
    * distributed, then compressed to a fixed-size Bloom bit array built
    * by a treeAggregate — the driver holds one filter, never the vocab
    * rows. The 100 TB train scan probes it map-side
    * ([[graft.functions.BloomMightContain]], codegen'd), so ~(1 − fpp) of
    * train shingles die before the exchange; only the ~fpp false
    * positives plus true hits reach the exact join. With a plain
    * broadcast-hash semi-join the full eval vocab must fit executor
    * memory as a hash relation (~50 bytes/entry); the Bloom form needs
    * ~1.2 bytes/entry at 1% fpp — the difference between "broadcast 10⁸
    * n-grams" failing and working.
    */
  def contaminatedTrainDocs(train: DataFrame, eval: DataFrame, idCol: String,
                            textCol: String, n: Int,
                            fpp: Double = 0.01): DataFrame = {
    val evalVocab = DedupOps.shingleIndex(eval, idCol, textCol, n)
      .select(col("shingle")).distinct()
    val nVocab = evalVocab.count()
    // empty eval side: nothing can be contaminated — and stat.bloomFilter
    // NPEs on zero rows (its aggregation buffer never initializes), so
    // the probe is replaced by a constant-false filter with the same
    // schema and the exact confirm join still produces the empty result
    val probed =
      if (nVocab == 0) DedupOps.shingleIndex(train, idCol, textCol, n).filter(lit(false))
      else {
        val bloom = evalVocab.stat.bloomFilter("shingle", nVocab, fpp)
        DedupOps.shingleIndex(train, idCol, textCol, n)
          .filter(graft.functions.BloomMightContain.mightContain(col("shingle"), bloom))
      }
    probed
      .join(evalVocab, Seq("shingle")) // exact confirm: bloom FPs die here
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_contaminated"))
  }

  /** Sequence PACKING index: assign documents (in deterministic id order
    * within a shard) to fixed-capacity token bins — the
    * concat-short-docs-into-training-windows step, computed as a pure
    * prefix-sum so it distributes: pack_id = ⌊exclusive-prefix-token-sum
    * / capacity⌋. A doc straddling a boundary stays in the earlier pack
    * (real packers then split its tokens at write time; the INDEX is the
    * distributed part). Window runs per shard — the global-order variant
    * would serialize on one partition, which is exactly what sharding
    * avoids at 100 TB. All-integer arithmetic, engine-exact.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    shardCol: String, capacity: Long): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), col(shardCol),
        size(TextOps.tokens(col(textCol))).cast("bigint").as("n_tokens"))
      .withColumn("__prev", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id",
        floor(col("__prev").cast("double") / capacity).cast("bigint"))
      .drop("__prev")
  }

  /** Split documents into fixed-size token chunks with overlap — the
    * embedding/RAG-pipeline splitter. Chunk i covers token positions
    * [i·step, i·step + chunkTokens) with step = chunkTokens − overlap;
    * every token is in at least one chunk and consecutive chunks share
    * `overlap` tokens. Pure per-row generate-and-explode projection:
    * map-only at any scale, output ∝ input · chunk/(chunk−overlap).
    */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got $overlap / $chunkTokens")
    val step = chunkTokens - overlap
    val toks = TextOps.tokens(col(textCol))
    docs
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)), lit(step)))
          .as(Seq("chunk_idx", "__start")))
      .select(col(idCol), col("chunk_idx").cast("bigint").as("chunk_idx"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(size(col("__toks")) - col("__start"), lit(chunkTokens))
          .cast("bigint").as("n_tokens"))
  }

  /** Materialize the packing plan into actual training shards: join the
    * [[packSequences]] assignment back to the text and concatenate each
    * bin's documents in doc-id order. `collect_list` order is
    * execution-dependent, so the documents are collected as (id, text)
    * structs and `array_sort`ed before joining — deterministic at any
    * parallelism (struct ordering leads with the unique id). One shuffle
    * on (shard, pack_id); a bin holds ≤ capacity tokens by construction,
    * so per-group state is bounded — the groupBy never sees more than
    * one training sequence's worth of text.
    */
  def assemblePacks(docs: DataFrame, idCol: String, textCol: String,
                    shardCol: String, capacity: Long): DataFrame =
    packSequences(docs, idCol, textCol, shardCol, capacity)
      .join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .groupBy(col(shardCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col(idCol).as("i"), col(textCol).as("t")))),
          s => s.getField("t")), " ").as("pack_text"))

  /** Composite quality gate (the filter stage every pretraining corpus
    * runs): token-count band + stopword-ratio floor + language
    * requirement. Returns the PASSING docs with their metrics — one
    * projection, no shuffle; at 100 TB this is a map-only job.
    */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String,
                    stopwords: Seq[String], minTokens: Long, maxTokens: Long,
                    minStopRatio: Double, requiredLang: String): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    docs.select(col(idCol),
        size(toks).cast("bigint").as("n_tokens"),
        Numeric.roundBin(
          TextOps.markerCount(col(textCol), stopwords).cast("double") / size(toks), 4)
          .as("stop_ratio"),
        TextOps.langId(col(textCol)).as("lang_pred"))
      .filter(col("n_tokens").between(minTokens, maxTokens) &&
        col("stop_ratio") >= minStopRatio &&
        col("lang_pred") === requiredLang)
  }

  /** Portable SQL for the md5 byte at `pos` (0-based) of an id — the
    * [[splitBucketSql]] nibble trick generalized; identical text runs in
    * Spark and DuckDB.
    */
  def hashByteSql(idExpr: String, pos: Int): String = {
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substr(md5(CAST($idExpr AS STRING)), ${2 * pos + i}, 1)) - 1)"
    s"(${nib(1)} * 16 + ${nib(2)})"
  }

  /** The Efraimidis–Spirakis exponential-race key for weighted sampling
    * as portable SQL: key = −ln(u)/w with u a 32-bit md5-derived
    * uniform in (0,1). The doc with the SMALLEST key wins a race whose
    * win probability is proportional to its weight — so `ORDER BY key
    * LIMIT k` is a weight-proportional sample without replacement
    * (Efraimidis & Spirakis 2006, via the exponential formulation:
    * −ln(u)/w ~ Exp(w)).
    *
    * Determinism: u is pure integer hashing (identical text both
    * engines); the single ln + divide are ≤1-ulp libm calls absorbed by
    * [[Numeric.roundBinSql]] at 9 decimals with an id tie-break — the
    * same accepted-risk pattern as the cosine rounding. No random(),
    * so the sample is reproducible at any parallelism and re-drawable
    * per `seedExpr` (salt the id to draw a different sample).
    */
  def esKeySql(idExpr: String, weightExpr: String): String = {
    // bytes cast to BIGINT before the place-value multiply: 255·2^24
    // overflows INT32 under ANSI arithmetic
    val u32 = (0 to 3)
      .map(p => s"CAST(${hashByteSql(idExpr, p)} AS BIGINT) * ${1L << (8 * (3 - p))}")
      .mkString(" + ")
    val u = s"(CAST($u32 AS DOUBLE) + 0.5) / 4294967296.0"
    Numeric.roundBinSql(s"-ln($u) / CAST($weightExpr AS DOUBLE)", 9)
  }

  /** Weighted sample without replacement: the `k` docs winning the E–S
    * race. One TakeOrderedAndProject — no full sort, no shuffle of the
    * losers; at 100 TB each partition keeps its local top-k and only
    * k-sized heads move.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame =
    df.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol),
        expr(esKeySql(idCol, weightCol)).as("es_key"))
      .orderBy(col("es_key").asc, col(idCol).asc)
      .limit(k)
}
