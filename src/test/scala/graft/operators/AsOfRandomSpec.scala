package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** Randomized differential for the native as-of exec: dense key/time
  * collisions, NULL keys and NULL times, several partitionings — every
  * direction checked against an in-memory brute-force reference (not
  * against the composed operator, so a shared misunderstanding cannot
  * hide). Seeds are FIXED: failures reproduce.
  */
class AsOfRandomSpec extends SparkSuite {
  import spark.implicits._

  private case class L(lid: Long, key: Option[Long], t: Option[Long])
  private case class R(rid: Long, key: Option[Long], t: Option[Long], pay: Long)

  /** Brute force: for each left row, scan all rights, apply the
    * direction's selection + tie rules + tolerance.
    */
  private def reference(ls: Seq[L], rs: Seq[R], dir: String,
                        tol: Option[Long]): Set[(Long, Option[Long], Option[Long])] =
    ls.map { l =>
      val cands =
        if (l.key.isEmpty || l.t.isEmpty) Seq.empty
        else rs.filter(r => r.key == l.key && r.t.isDefined)
      val lt = l.t.getOrElse(0L)
      def within(d: Long) = tol.forall(d <= _)
      val pick: Option[(R, Long)] = dir match {
        case "backward" =>
          val c = cands.filter(_.t.get <= lt)
          if (c.isEmpty) None
          else {
            val best = c.maxBy(r => (r.t.get, r.rid))
            Some((best, lt - best.t.get)).filter(p => within(p._2))
          }
        case "forward" =>
          val c = cands.filter(_.t.get >= lt)
          if (c.isEmpty) None
          else {
            val best = c.minBy(r => (r.t.get, r.rid))
            Some((best, best.t.get - lt)).filter(p => within(p._2))
          }
        case "nearest" =>
          val c = cands
          if (c.isEmpty) None
          else {
            // min |dist|; tie backward; within side: backward largest
            // (t, rid), forward smallest (t, rid)
            val best = c.minBy { r =>
              val d = math.abs(r.t.get - lt)
              val side = if (r.t.get <= lt) 0 else 1
              val tie = if (side == 0) -r.rid else r.rid
              (d, side, tie)
            }
            Some((best, math.abs(best.t.get - lt))).filter(p => within(p._2))
          }
      }
      (l.lid, pick.map(_._1.pay), pick.map(_._2))
    }.toSet

  private def toLeftDf(ls: Seq[L]): DataFrame =
    ls.map(l => (l.lid, l.key, l.t.map(us => new Timestamp(us / 1000))))
      .toDF("lid", "key", "ts")
      .selectExpr("lid", "key", "timestamp_micros(CAST(unix_millis(ts) AS BIGINT) * 1000) AS ts")

  private def toRightDf(rs: Seq[R]): DataFrame =
    rs.map(r => (r.rid, r.key, r.t.map(us => new Timestamp(us / 1000)), r.pay))
      .toDF("rid", "key", "ts", "pay")
      .selectExpr("rid", "key", "timestamp_micros(CAST(unix_millis(ts) AS BIGINT) * 1000) AS ts", "pay")

  private def gen(seed: Long, nL: Int, nR: Int, nKeys: Int, tRange: Long)
      : (Seq[L], Seq[R]) = {
    val rnd = new scala.util.Random(seed)
    def key(): Option[Long] =
      if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(nKeys).toLong)
    // millisecond-aligned so the Timestamp round-trip is exact
    def t(): Option[Long] =
      if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(tRange.toInt).toLong * 1000)
    val ls = (1 to nL).map(i => L(i.toLong, key(), t()))
    val rs = (1 to nR).map(i => R(i.toLong, key(), t(), pay = i.toLong * 7))
    (ls, rs)
  }

  for (seed <- Seq(1L, 42L, 2026L)) {
    test(s"randomized differential vs brute force, seed=$seed, all directions x tolerances x partitionings") {
      // small time range → heavy collisions: equal times within and
      // across sides exercise every tie rule
      val (ls, rs) = gen(seed, nL = 250, nR = 250, nKeys = 12, tRange = 40)
      for {
        dir <- Seq("backward", "forward", "nearest")
        tol <- Seq(None, Some(5000000L)) // 5s of the ~40s range
        parts <- Seq(1, 13)
      } {
        val lDf = toLeftDf(ls).repartition(parts)
        val rDf = toRightDf(rs).repartition(parts)
        val native = dir match {
          case "backward" => AsOf.joinBackwardNative(lDf, rDf, Seq("key"),
            "ts", "ts", Seq("pay"), "rid", tol)
          case "forward" => AsOf.joinForwardNative(lDf, rDf, Seq("key"),
            "ts", "ts", Seq("pay"), "rid", tol)
          case "nearest" => AsOf.joinNearestNative(lDf, rDf, Seq("key"),
            "ts", "ts", Seq("pay"), "rid", tol)
        }
        val got = native.select("lid", "pay", "asof_lag_us")
          .as[(Long, Option[Long], Option[Long])].collect().toSet
        val want = reference(ls, rs, dir, tol)
        assert(got == want,
          s"dir=$dir tol=$tol parts=$parts seed=$seed: " +
            s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      }
    }
  }
}
