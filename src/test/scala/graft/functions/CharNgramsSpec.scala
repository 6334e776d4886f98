package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** CharNgrams: parity with the composable HOF spelling (whose O(len²)
  * cost is why the native expression exists), UTF-8 codepoint
  * correctness, edge cases, and the SQL registration.
  */
class CharNgramsSpec extends SparkSuite {
  import spark.implicits._

  private def hofTrigrams(c: org.apache.spark.sql.Column) =
    transform(sequence(lit(1), length(c) - 2), i => c.substr(i, lit(3)))

  test("matches the HOF substr spelling on ASCII text (len >= n)") {
    // the HOF spelling is only well-defined for length >= n: below that,
    // sequence(1, len-2) counts DOWN and substr repeats the head — the
    // native expression returns the correct empty array there instead
    // (covered below), which is one more reason it exists
    val docs = Seq("key agg row", "abc", "abcd", "a b c d", "xxxxxxxx")
      .toDF("text").filter(length(col("text")) >= 3)
    val diff = docs
      .select(CharNgrams.charNgrams(col("text"), 3).as("fast"),
        hofTrigrams(col("text")).as("slow"))
      .filter(not(col("fast") === col("slow")))
    assert(diff.count() == 0)
  }

  test("slices codepoints, not bytes, on multibyte UTF-8") {
    val got = Seq("héllo✓!").toDF("text")
      .select(CharNgrams.charNgrams(col("text"), 2).as("g"))
      .as[Seq[String]].head()
    assert(got == Seq("hé", "él", "ll", "lo", "o✓", "✓!"))
  }

  test("short strings and n=1") {
    val df = Seq(("ab", 1)).toDF("text", "ignore")
    assert(df.select(CharNgrams.charNgrams(col("text"), 3).as("g"))
      .as[Seq[String]].head().isEmpty)
    assert(df.select(CharNgrams.charNgrams(col("text"), 1).as("g"))
      .as[Seq[String]].head() == Seq("a", "b"))
    assert(df.select(CharNgrams.charNgrams(col("text"), 2).as("g"))
      .as[Seq[String]].head() == Seq("ab"))
  }

  test("null input propagates, registered as SQL char_ngrams") {
    val viaSql = spark.sql(
      "SELECT char_ngrams('abcd', 2) AS g, char_ngrams(CAST(NULL AS STRING), 2) AS n")
      .head()
    assert(viaSql.getSeq[String](0) == Seq("ab", "bc", "cd"))
    assert(viaSql.isNullAt(1))
  }
}
