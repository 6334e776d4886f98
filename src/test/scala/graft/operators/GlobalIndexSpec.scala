package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Contracts of the distributed global row number: exact permutation
  * 1..N in key order, bucket-count independence (the physical knob
  * never changes the answer), composite tie-breaks, clumped-key
  * correctness (skew hurts balance, not answers).
  */
class GlobalIndexSpec extends SparkSuite {
  import spark.implicits._

  test("contiguous 1..N in key order, any bucket count") {
    val keys = Seq(42L, 7L, 99L, 1L, 56L, 13L, 77L, 2L)
    val df = keys.toDF("k").repartition(4)
    for (b <- Seq(1, 3, 64)) {
      val out = GlobalIndex.rowNumber(df, Seq("k"), buckets = b)
        .as[(Long, Long)].collect().toMap
      val expected = keys.sorted.zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
      assert(out == expected, s"buckets=$b: $out")
    }
  }

  test("composite tie-break: second column orders within equal first keys") {
    val df = Seq((10L, "b"), (10L, "a"), (5L, "z"), (10L, "c"))
      .toDF("k", "t").repartition(3)
    val out = GlobalIndex.rowNumber(df, Seq("k", "t"), buckets = 8)
      .select(col("k"), col("t"), col("rn"))
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((5L, "z", 1L), (10L, "a", 2L), (10L, "b", 3L), (10L, "c", 4L)))
  }

  test("clumped keys: all rows landing in one value bucket still rank correctly") {
    // range [0, 1000000] with 64 buckets, but every key sits in a
    // 10-wide clump -> one bucket holds everything except the outlier
    val keys = (0L until 50L).map(_ + 500000L) :+ 0L :+ 1000000L
    val out = GlobalIndex.rowNumber(keys.toDF("k").repartition(5),
      Seq("k"), buckets = 64).as[(Long, Long)].collect().toMap
    val expected = keys.sorted.zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
    assert(out == expected)
  }

  test("null order key fails loudly instead of silently dropping the row") {
    // r7 ADVICE: a null leading key used to get a null __bk and vanish
    // in the inner offsets join — a silent contract break
    import org.apache.spark.sql.functions.lit
    val df = spark.range(5).selectExpr("id as k")
      .unionAll(spark.range(1).select(lit(null).cast("long").as("k")))
    val ex = intercept[Exception] {
      GlobalIndex.rowNumber(df, Seq("k"), buckets = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("null order key")),
      s"expected the loud null-key error, got: $ex")
  }

  test("single row and empty input") {
    assert(GlobalIndex.rowNumber(Seq(9L).toDF("k"), Seq("k"), 16)
      .as[(Long, Long)].collect().toSeq == Seq((9L, 1L)))
    assert(GlobalIndex.rowNumber(Seq.empty[Long].toDF("k"), Seq("k"), 16)
      .count() == 0L)
  }

  test("no single-partition data window: the plan has no empty-partition global sort over the input") {
    // the only Window without PARTITION BY runs over the buckets-sized
    // count table; the data-sized window is partitioned by bucket
    val df = (1L to 1000L).toDF("k").repartition(8)
    val plan = GlobalIndex.rowNumber(df, Seq("k"), buckets = 32)
      .queryExecution.optimizedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty)
    // every window spec over the data carries the bucket partition key
    val dataWindows = windows.filter(_.contains("row_number"))
    assert(dataWindows.forall(_.contains("__bk")),
      s"global-order data window found:\n$plan")
  }
}
