package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

class MisraGriesSpec extends SparkSuite {
  import spark.implicits._

  private def sketch(df: DataFrame, capacity: Int): Map[String, Long] =
    df.agg(MisraGries.misraGries($"item", capacity).as("mg"))
      .select(explode($"mg").as(Seq("item", "cnt")))
      .as[(String, Long)].collect().toMap

  private def exact(df: DataFrame): Map[String, Long] =
    df.groupBy($"item").count().as[(String, Long)].collect().toMap

  test("capacity ≥ distinct: counts are exact under any partitioning") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split($"text", " ")).as("item"))
    val truth = exact(df)
    assert(truth.size < 256)
    for (p <- Seq(1, 13)) {
      assert(sketch(df.repartition(p), 256) == truth)
    }
  }

  test("capacity < distinct: MG bound holds — underestimates by ≤ N/(k+1), heavy items survive") {
    // skewed stream: 2 heavy items (500 each), 100 light items (5 each)
    val rows = Seq.tabulate(500)(_ => "hh1") ++ Seq.tabulate(500)(_ => "hh2") ++
      (0 until 100).flatMap(i => Seq.fill(5)(s"light$i"))
    val n = rows.size
    val k = 16
    val bound = n / (k + 1) // 88
    val truth = Map("hh1" -> 500L, "hh2" -> 500L) ++
      (0 until 100).map(i => s"light$i" -> 5L)
    for (p <- Seq(1, 7)) {
      val mg = sketch(rows.toDF("item").repartition(p), k)
      assert(mg.size <= k)
      // every estimate is a lower bound within N/(k+1) of the truth
      mg.foreach { case (item, est) =>
        assert(est <= truth(item), s"$item overestimated")
        assert(truth(item) - est <= bound, s"$item under by more than $bound")
      }
      // anything with true count > N/(k+1) must be retained
      assert(mg.contains("hh1") && mg.contains("hh2"))
    }
  }

  test("nulls are ignored; sketch survives serialize round-trip across a shuffle") {
    val df = (Seq.fill(10)(Some("a")) ++ Seq(None, None) ++ Seq.fill(3)(Some("b")))
      .toDF("item")
    assert(sketch(df.repartition(5), 8) == Map("a" -> 10L, "b" -> 3L))
  }

}
