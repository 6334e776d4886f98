package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join via a bucket grid.
  *
  * Spark plans a raw `p.ts BETWEEN i.start AND i.end` join (with only
  * the key as an equi-predicate) as a sort-merge join whose per-key
  * candidate set is every (point, interval) pair for that key — O(n·m)
  * comparisons per key, a broadcast-nested-loop when no key exists at
  * all. The grid join is the scale shape: quantize time into
  * `bucketWidthUs` buckets, replicate each interval onto the buckets it
  * overlaps, tag each point with its single bucket, and equi-join on
  * (keys, bucket) before the exact containment filter. Candidates drop
  * from all-pairs-per-key to pairs-sharing-a-bucket; the join is a
  * plain hash/SMJ equi-join Catalyst and AQE handle like any other
  * (broadcastable small side, skew-splittable).
  *
  * Bucket-width rule: replication factor per interval is
  * `len/width + 1`, candidate precision falls as width grows — pick
  * width ≈ the median interval length (same contract as the LSH
  * band-sizing rule in SEMANTICS.md). A point joins each interval
  * exactly once (a point has ONE bucket), so no post-join dedup is
  * needed, and intervals with `end < start` are dropped as malformed
  * rather than silently exploded into a descending bucket sequence.
  */
object RangeJoin {

  /** Inner point-in-interval join: one output row per (point, containing
    * interval), `startCol <= ts <= endCol`, equal keys. Emits all point
    * columns + all interval columns (caller pre-renames collisions).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointTs: String,
                      startCol: String, endCol: String,
                      bucketWidthUs: Long): DataFrame = {
    require(bucketWidthUs > 0, "bucket width must be positive")
    // integer `div` (not double /): micro timestamps near 2^50 lose bits
    // in a double divide and a boundary point could land one bucket off
    // its interval's replicas
    def bucketOf(c: String): Column = expr(s"unix_micros($c) div ${bucketWidthUs}L")
    val iv = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__b", explode(sequence(bucketOf(startCol), bucketOf(endCol))))
    points
      .withColumn("__b", bucketOf(pointTs))
      .join(iv, keys :+ "__b")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__b")
  }
}
