package graft.streaming

/** Opt-in switch for shard consolidation INSIDE the drain tails
  * (r11 VERDICT #2): when enabled, the availableNow* chains run the
  * crash-atomic [[graft.operators.Compact.compactShards]] over their
  * `batch=` stores after the drain terminates — i.e. strictly behind
  * the replay watermark (an AvailableNow drain commits every batch
  * before returning; the as-of chain additionally scopes to the mart's
  * `_applied_batch` marker). Result-identical by the compaction
  * contract (layout-only — StreamingAnnSpec / StreamingBm25Spec /
  * StreamingAsOfSpec pin drain-with-compaction parity); OFF by default
  * so committed bench references keep measuring the un-maintained
  * shard path.
  */
object DrainCompact {
  def enabled: Boolean = sys.env.get("GRAFT_DRAIN_COMPACT").contains("1")
}
