package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Bpe
import graft.functions.CountMin

/** Text-mining additions to the training-data family: BPE training
  * statistics and corpus-frequency familiarity scoring. The iterative
  * BPE merge loop itself is driver-coordinated (Bpe.train, BpeSpec);
  * what is registered here are its set-oriented stages, which have
  * exact DuckDB twins.
  */
object MiningQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- round-1 BPE statistics: corpus → word frequencies (the one
    //      corpus-sized shuffle) → weighted adjacent-pair counts over
    //      the bounded vocab table
    "x_bpe_pair_counts" -> ((s, d) =>
      Bpe.pairCounts(Bpe.wordFrequencies(Tables.documents(s, d), "text"))),

    // ---- tokenizer APPLICATION: encode the corpus with a FIXED merge
    //      table (Bpe.DemoMerges — at apply time a tokenizer is a
    //      frozen artifact, which is what makes encode oracle-checkable)
    //      and report per-doc token accounting. MAP-ONLY: zero shuffles
    //      at any corpus scale — one projection of codegen'd string ops
    //      (Bpe.encodeStats; the DuckDB twin is the identical
    //      wrap-and-replace spelling, and BpeSpec pins equivalence to
    //      the tokenize HOF scan).
    "x_bpe_encode" -> ((s, d) =>
      Bpe.encodeStats(Tables.documents(s, d), "doc_id", "text",
        Bpe.DemoMerges)),

    // ---- n-gram familiarity: score each document by how common its
    //      character trigrams are in the corpus — a perplexity-proxy
    //      quality signal with exact integer arithmetic (no logs → no
    //      cross-engine float drift). Two aggregations plus one join;
    //      the trigram-frequency table is bounded by the alphabet
    //      (≤ ~1M entries for text), so it broadcasts at any corpus
    //      scale — the per-doc side never shuffles for the join.
    "x_ngram_familiarity" -> ((s, d) => {
      // per-doc trigram multiplicities first: trigrams repeat heavily
      // inside a document, so the partial (map-side) aggregation absorbs
      // the explode before anything shuffles — and the exploded stream is
      // consumed ONCE (a shared `tg` feeding both an agg and a join would
      // recompute it). familiarity = Σ_t n_doc(t)·tc(t) ≡ the
      // per-occurrence sum, with far fewer joined rows.
      // char_ngrams is the native single-pass expression — the HOF
      // substr spelling is O(len²) per document (see CharNgrams doc)
      val perDoc = Tables.documents(s, d)
        .filter(length(col("text")) >= 3)
        .select(col("doc_id"),
          explode(graft.functions.CharNgrams.charNgrams(col("text"), 3)).as("t"))
        .groupBy(col("doc_id"), col("t"))
        .agg(count(lit(1)).as("n"))
      // perDoc feeds two branches; the counts branch collapses to the
      // bounded trigram vocab right away, so recomputing the explode for
      // it is cheaper than materializing the intermediate (measured: a
      // localCheckpoint here costs more than both passes). At warehouse
      // scale `counts` is a persisted corpus-stats artifact, not inline.
      val counts = perDoc.groupBy(col("t")).agg(sum(col("n")).as("tc"))
      perDoc.join(broadcast(counts), "t")
        .groupBy(col("doc_id"))
        .agg(sum(col("n") * col("tc")).as("familiarity"))
    }),

    // ---- Count-Min sketch: frequency estimates for the 30 most common
    //      tokens, next to their exact counts. The sketch is ONE
    //      group-less aggregate (4×256 longs of state, map-side
    //      partials absorb the token stream); the exact-count side is
    //      the demonstration/validation half — at corpus scale only the
    //      sketch is kept and the estimate replaces the exact GROUP BY.
    //      Estimates are deterministic (md5 buckets, integer sums), so
    //      the DuckDB twin reproduces sketch AND estimates exactly.
    "x_count_min" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
      val sketch = toks.agg(CountMin.countMinSketch(col("tok"), 4).as("sk"))
      val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok")).limit(30)
      // 1-row sketch broadcast against 30 rows — no shuffle for the probe
      top.crossJoin(broadcast(sketch))
        .select(col("tok"), col("exact_cnt"),
          CountMin.cmEstimate(col("sk"), col("tok"), 4).as("cm_est"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    "x_bpe_pair_counts" ->
      """WITH w AS (
        |  SELECT word, count(*) AS freq FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
        |    FROM documents)
        |  WHERE word <> '' GROUP BY word),
        |p AS (
        |  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, freq
        |  FROM w, LATERAL (SELECT unnest(generate_series(1, len(word) - 1)) AS i) t
        |  WHERE len(word) >= 2)
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
        |FROM p GROUP BY pair""".stripMargin,

    // tokenizer-apply twin: greedy l-t-r merge application spelled as
    // nested literal replace() over the per-char (x)(y)-wrapped word.
    // Both engines' replace is a left-to-right NON-OVERLAPPING scan
    // that continues after each replacement, which is exactly the
    // greedy per-merge BPE pass ((a,a) over "aaa" fuses once) — and a
    // fused "(ab)" can never retrigger "(a)(b)" textually, so the
    // nested fold is round-equivalent to Bpe.tokenize's HOF scan.
    "x_bpe_encode" -> {
      // the identical wrap-and-replace spelling as Bpe.encodeStats:
      // chars wrapped as (c), spaces unwrapped (merges can't span a
      // word boundary), merge table folded as non-overlapping literal
      // replace — pieces = '(' count of the folded string
      val enc = Bpe.DemoMerges.foldLeft(
        "regexp_replace(t, '([a-z0-9])', '(\\1)', 'g')") {
          case (acc, (a, b)) => s"replace($acc, '($a)($b)', '($a$b)')"
        }
      s"""WITH n AS (
         |  SELECT doc_id,
         |    regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g') AS t
         |  FROM documents),
         |e AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split_regex(t, '\\s+'),
         |      x -> x <> '')) AS BIGINT) AS n_words,
         |    CAST(length($enc)
         |      - length(replace($enc, '(', '')) AS BIGINT) AS n_pieces,
         |    CAST(length(regexp_replace(t, '\\s', '', 'g')) AS BIGINT)
         |      AS n_chars
         |  FROM n)
         |SELECT doc_id, n_words, n_pieces, n_chars,
         |  ${graft.functions.Numeric.roundBinSql(
              "CAST(n_chars AS DOUBLE) / nullif(CAST(n_pieces AS DOUBLE), 0.0)", 4)}
         |    AS compression
         |FROM e""".stripMargin
    },

    "x_ngram_familiarity" ->
      """WITH tg AS (
        |  SELECT doc_id, substr(text, CAST(i AS INTEGER), 3) AS t
        |  FROM documents,
        |    LATERAL (SELECT unnest(generate_series(1, len(text) - 2)) AS i) u
        |  WHERE len(text) >= 3),
        |c AS (SELECT t, count(*) AS tc FROM tg GROUP BY t)
        |SELECT doc_id, CAST(sum(tc) AS BIGINT) AS familiarity
        |FROM tg JOIN c USING (t) GROUP BY doc_id""".stripMargin,

    // Count-Min twin: the sketch's (row j, bucket b) counters are plain
    // GROUP BY sums over the same md5 bucketing (first digest byte via
    // nibble parse); the estimate is min over j — identical integers to
    // the aggregate's element-wise-sum state.
    "x_count_min" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents),
        |tt AS (SELECT tok FROM t WHERE tok <> ''),
        |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
        |h AS (
        |  SELECT tok, j,
        |    (instr('0123456789abcdef',
        |       substr(md5(CAST(j AS VARCHAR) || '|' || tok), 1, 1)) - 1) * 16
        |    + instr('0123456789abcdef',
        |       substr(md5(CAST(j AS VARCHAR) || '|' || tok), 2, 1)) - 1 AS b
        |  FROM tt, js),
        |c AS (SELECT j, b, CAST(count(*) AS BIGINT) AS cnt FROM h GROUP BY j, b),
        |top AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt
        |  FROM tt GROUP BY tok
        |  ORDER BY exact_cnt DESC, tok LIMIT 30),
        |q AS (
        |  SELECT top.tok, top.exact_cnt, js.j,
        |    (instr('0123456789abcdef',
        |       substr(md5(CAST(js.j AS VARCHAR) || '|' || top.tok), 1, 1)) - 1) * 16
        |    + instr('0123456789abcdef',
        |       substr(md5(CAST(js.j AS VARCHAR) || '|' || top.tok), 2, 1)) - 1 AS b
        |  FROM top, js)
        |SELECT q.tok, q.exact_cnt, CAST(min(c.cnt) AS BIGINT) AS cm_est
        |FROM q JOIN c ON c.j = q.j AND c.b = q.b
        |GROUP BY q.tok, q.exact_cnt""".stripMargin
  )
}
