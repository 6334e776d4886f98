package graft

import org.apache.spark.sql.SparkSession

/** Canonical session configuration — the one place the engine's scale
  * posture is encoded, applied by every entry point (Verify, Bench, the
  * test harness, user sessions).
  *
  * Why this exists: SCALE.md's sf10 probes showed the fixed
  * `spark.sql.shuffle.partitions = cores` test-rig constant is exactly
  * what makes sort-heavy stages spill at 10×+ data (`j4_semi_join` 53 s,
  * `x_jaccard_pairs` 85 s → 52 s at 256 partitions). The engine default
  * is therefore AQE-first: shuffles START wide
  * (`coalescePartitions.initialPartitionNum`, default 256 ≈ the measured
  * spill-free width at sf10) and AQE coalesces them DOWN to the advisory
  * partition size at runtime, so small inputs don't pay 256 tasks and
  * big inputs don't spill at 32. This is how a 1000-executor cluster is
  * sized too — initial width scales with max expected input, AQE adapts
  * per-stage to actual bytes. Skew-join handling rides the same AQE
  * switch.
  *
  * The static `spark.sql.shuffle.partitions` remains only as the
  * non-AQE fallback and can still be overridden per-run
  * (SPARK_GRAFT_BENCH_PARTITIONS) for probes.
  */
object GraftSession {

  /** Shuffle width AQE starts from before coalescing down; the sf10
    * spill-free width from SCALE.md. Override per-session via
    * [[configure]]'s `initialPartitions`.
    */
  val DefaultInitialPartitions = 256

  /** Apply the engine's canonical config to a builder. `partitions` is
    * the non-AQE fallback width; `initialPartitions` the pre-coalesce
    * AQE width (≥ partitions, or AQE would narrow below the fallback).
    */
  def configure(
      b: SparkSession.Builder,
      partitions: Int,
      initialPartitions: Int = DefaultInitialPartitions): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        math.max(partitions, initialPartitions).toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)

  /** Local session with the canonical config (tests, probes, mains). */
  def local(cores: Int, partitions: Int,
      initialPartitions: Int = DefaultInitialPartitions,
      appName: String = "graft"): SparkSession =
    configure(
      SparkSession.builder().master(s"local[$cores]").appName(appName),
      partitions, initialPartitions).getOrCreate()
}
