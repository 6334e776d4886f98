package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface parity for the injected functions: same results as the
  * Column-API entry points, through a session built with the extension.
  */
class GraftExtensionsSpec extends SparkSuite {

  private def withExtSession[A](f: SparkSession => A): A = {
    val base = spark // force the shared suite session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(ext)
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("dot_product_scaled is callable from SQL and matches the Column API") {
    withExtSession { s =>
      val r = s.sql(
        """SELECT dot_product_scaled(array(float(1.0), float(2.0)),
          |                          array(float(3.0), float(4.0)),
          |                          1000000000000) AS d""".stripMargin)
        .collect().head.getLong(0)
      assert(r == 11L * 1000000000000L)
      // null propagation on length mismatch, like zip_with
      assert(s.sql(
        "SELECT dot_product_scaled(array(float(1.0)), array(float(1.0), float(2.0)), 10)")
        .collect().head.isNullAt(0))
    }
  }

  test("sorted_intersect_count is callable from SQL and type-checks its inputs") {
    withExtSession { s =>
      val r = s.sql(
        "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(2L, 3L, 5L, 9L)) AS c")
        .collect().head.getLong(0)
      assert(r == 2L)
      // non-BIGINT arrays are an analysis error, not garbage counts
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT sorted_intersect_count(array(1, 3), array(3))").collect()
      }
      assert(e.getMessage.contains("ARRAY<BIGINT>"), e.getMessage)
    }
  }

  test("word_shingles is callable from SQL with and without distinct") {
    withExtSession { s =>
      val r = s.sql("SELECT word_shingles('a b c d', 3) AS sh")
        .collect().head.getSeq[String](0)
      assert(r == Seq("a b c", "b c d"))
      val d = s.sql("SELECT word_shingles('a b a b a b', 2, true) AS sh")
        .collect().head.getSeq[String](0)
      assert(d == Seq("a b", "b a"))
    }
  }

  test("minhash_sig aggregate from SQL equals the min(md5) formulation") {
    withExtSession { s =>
      s.sql("SELECT explode(array('x y z', 'y z w', 'z w v')) AS shingle")
        .createOrReplaceTempView("sh")
      val row = s.sql(
        """SELECT minhash_sig(shingle, 2) AS sig,
          |       min(md5(concat('0|', shingle))) AS mh0,
          |       min(md5(concat('1|', shingle))) AS mh1
          |FROM sh""".stripMargin).collect().head
      val sig = row.getSeq[String](0)
      assert(sig == Seq(row.getString(1), row.getString(2)))
    }
  }

  test("optimizer rewrites the HOF dot-product spelling to the native expression") {
    import org.apache.spark.sql.functions._
    val scale = graft.ext.Similarity.Scale
    withExtSession { s =>
      // parquet-backed, NOT local/literal input: ConstantFolding would
      // evaluate a literal dot at plan time and ConvertToLocalRelation
      // would collapse a local relation — either hides the rewritten node
      val df = s.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("embedding").as("a"), col("embedding").as("b"))
      // Column-API spelling
      val q = df.select(graft.ext.Similarity.dotScaledHof(col("a"), col("b")).as("d"))
      assert(q.queryExecution.executedPlan.toString.contains("dot_product_scaled"),
        "HOF form not rewritten to the native expression")
      val native = df.select(
        graft.ext.Similarity.dotScaled(col("a"), col("b")).as("d"))
        .collect().map(_.getLong(0)).toSeq
      assert(q.collect().map(_.getLong(0)).toSeq == native)
      // the raw-SQL spelling a warehouse user writes goes through the
      // same analyzed shape and rewrites too
      df.createOrReplaceTempView("v")
      val sqlQ = s.sql(
        s"""SELECT aggregate(zip_with(a, b,
           |  (x, y) -> floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * $scale + 0.5D)),
           |  0L, (acc, v) -> acc + v) AS d FROM v""".stripMargin)
      assert(sqlQ.queryExecution.executedPlan.toString.contains("dot_product_scaled"))
      assert(sqlQ.collect().map(_.getLong(0)).toSeq == native)
      // near-miss (0.6 rounding constant) is NOT rewritten — strict match
      val near = df.select(aggregate(
        zip_with(col("a"), col("b"),
          (x, y) => floor(x.cast("double") * y.cast("double") * lit(scale) + lit(0.6))),
        lit(0L), (acc, x) => acc + x).as("d"))
      assert(!near.queryExecution.executedPlan.toString.contains("dot_product_scaled"))
    }
  }

  test("hll_distinct from SQL matches the Column API and the exact count at small n") {
    withExtSession { s =>
      val r = s.sql(
        """SELECT hll_distinct(id % 100) AS approx, count(DISTINCT id % 100) AS exact
          |FROM range(0, 10000)""".stripMargin).collect().head
      val viaColumn = s.range(0, 10000)
        .agg(graft.functions.HllDistinct.hllDistinct(
          org.apache.spark.sql.functions.expr("id % 100")).as("a"))
        .collect().head.getLong(0)
      assert(r.getLong(0) == viaColumn)
      // linear-counting regime: estimate within the 3·rsd spec bound
      assert(math.abs(r.getLong(0) - r.getLong(1)) <= 20)
    }
  }

  test("hll_sketch + hll_merge_estimate from SQL: the stored split equals hll_distinct") {
    withExtSession { s =>
      val r = s.sql(
        """WITH cells AS (
          |  SELECT id % 7 AS grp, id % 3 AS day, hll_sketch(id % 500) AS sk
          |  FROM range(0, 10000) GROUP BY 1, 2)
          |SELECT grp, hll_merge_estimate(sk) AS merged FROM cells GROUP BY grp
          |ORDER BY grp""".stripMargin).collect()
      val direct = s.sql(
        """SELECT id % 7 AS grp, hll_distinct(id % 500) AS est
          |FROM range(0, 10000) GROUP BY grp ORDER BY grp""".stripMargin).collect()
      assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq ==
        direct.map(x => (x.getLong(0), x.getLong(1))).toSeq)
      assert(r.length == 7)
    }
  }

  test("bottom_k_sample from SQL selects the k smallest-tagged rows") {
    withExtSession { s =>
      val sample = s.sql(
        """SELECT bottom_k_sample(md5(CAST(id AS STRING)), id, 5) AS sm
          |FROM range(0, 1000)""".stripMargin)
        .selectExpr("explode(sm) AS v").collect().map(_.getDouble(0)).toSet
      val expected = s.sql(
        """SELECT CAST(id AS DOUBLE) AS v FROM range(0, 1000)
          |ORDER BY md5(CAST(id AS STRING)) LIMIT 5""".stripMargin)
        .collect().map(_.getDouble(0)).toSet
      assert(sample == expected)
    }
  }

  test("hist_quantiles from SQL matches the Column API on known edges") {
    withExtSession { s =>
      // ids 0..99 over [0,100) width 10: p50 target 50 → bucket 4 edge 40,
      // p100 → bucket 9 edge 90
      val out = s.sql(
        """SELECT hist_quantiles(id, 0, 10, 10, '50,100') AS q
          |FROM range(0, 100)""".stripMargin)
        .selectExpr("q[0]", "q[1]").collect().head
      assert((out.getLong(0), out.getLong(1)) == (40L, 90L))
    }
  }

  test("top_k from SQL equals the rank-window spelling") {
    withExtSession { s =>
      val agg = s.sql(
        """SELECT g, top_k(s, id, 3) AS top FROM (
          |  SELECT id % 2 AS g, (id * 37) % 100 AS s, id
          |  FROM range(0, 50)) GROUP BY g""".stripMargin)
        .selectExpr("g", "explode(top) AS e").selectExpr("g", "e.score", "e.id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val win = s.sql(
        """SELECT g, s AS score, id FROM (
          |  SELECT id % 2 AS g, (id * 37) % 100 AS s, id,
          |    row_number() OVER (PARTITION BY id % 2
          |      ORDER BY (id * 37) % 100 DESC, id) AS rn
          |  FROM range(0, 50)) WHERE rn <= 3""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(agg == win)
    }
  }

  test("misra_gries aggregate from SQL is exact when capacity covers the items") {
    withExtSession { s =>
      val m = s.sql(
        """SELECT misra_gries(CAST(id % 3 AS STRING), 8) AS mg
          |FROM range(0, 30)""".stripMargin)
        .selectExpr("explode(mg) AS (k, v)")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(m == Map("0" -> 10L, "1" -> 10L, "2" -> 10L))
    }
  }
}
