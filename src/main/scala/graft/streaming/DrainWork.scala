package graft.streaming

/** Scratch-directory provider for the bounded drains and the ephemeral
  * stored-index builds: prefers a RAM-backed filesystem (/dev/shm) over
  * `java.io.tmpdir` when present, writable, and comfortably roomy.
  *
  * Rationale (r10 VERDICT #3): at toy scale a drain's measured time is
  * dominated by commit machinery on local disk — AtomicSwap staging
  * writes + renames, dynamic-partition overwrites, streaming
  * offset/commit logs, the drain's own source materialization — six
  * commits on /tmp per drain in SCALE.md's accounting. None of that is
  * data-plane cost, and none of it touches local disk in a real
  * deployment (marts land in the warehouse store, checkpoints in the
  * streaming store); pinning the scratch to tmpfs shows the operators'
  * actual cost. Falls back to the default temp dir when /dev/shm is
  * absent (containers/mac).
  *
  * Guard rails (r11 ADVICE): tmpfs is typically capped at half of RAM
  * and shared with everything else on the host, so a larger-sf run
  * could fill it mid-bench — /dev/shm is used only while it reports
  * ≥ [[MinFreeBytes]] usable space (checked per allocation, so a run
  * that fills it degrades to disk instead of failing), and
  * `GRAFT_DRAIN_SCRATCH=tmp` opts out entirely (e.g. to compare
  * numbers against disk-scratch references: the scratch-medium switch
  * landed in r11, the round the committed references were re-measured).
  * The INPUT tables are never moved — only per-query scratch lands here.
  */
object DrainWork {

  /** Floor of usable /dev/shm space below which scratch falls back to
    * the default temp dir: 2 GiB, ~4× the largest per-drain scratch
    * footprint observed at sf1 (SCALE.md r11) — headroom, not a fit.
    */
  val MinFreeBytes: Long = 2L << 30

  private val optOut: Boolean =
    sys.env.get("GRAFT_DRAIN_SCRATCH").contains("tmp")

  private def shmUsable: Option[java.nio.file.Path] = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    try {
      if (!optOut && java.nio.file.Files.isDirectory(shm) &&
          java.nio.file.Files.isWritable(shm) &&
          java.nio.file.Files.getFileStore(shm).getUsableSpace >= MinFreeBytes)
        Some(shm)
      else None
    } catch { case _: java.io.IOException => None }
  }

  def tempDir(prefix: String): String = shmUsable match {
    case Some(b) => java.nio.file.Files.createTempDirectory(b, prefix).toString
    case None    => java.nio.file.Files.createTempDirectory(prefix).toString
  }

  /** The stable-scratch root, decided ONCE per JVM (r12 ADVICE):
    * [[stableDir]]'s whole contract is that a build and its
    * separate-call probe resolve the same location, so the medium
    * choice must not flip with a mid-run free-space dip — a flip would
    * silently point the probe at a possibly-stale twin on the other
    * medium. Memoizing pins the pair to one medium; if /dev/shm later
    * fills, the build itself fails loudly (ENOSPC) instead. Namespaced
    * per-user under a `graft-<user>` root (r12 ADVICE): predictable
    * world-shared leaf names under /dev/shm collided across users and
    * could be pre-created by another tenant. Concurrent runs by the
    * SAME user still share these dirs — the stored-index registry
    * assumes one bench/verify run per user per host, same as the
    * committed-reference measurement protocol.
    */
  private lazy val stableBase: java.nio.file.Path = {
    val user = sys.props.getOrElse("user.name", "anon")
    val base = shmUsable match {
      case Some(b) => b.resolve(s"graft-$user")
      case None => java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), s"graft-$user")
    }
    java.nio.file.Files.createDirectories(base)
    // createDirectories silently ADOPTS an existing dir, so the
    // namespace alone does not defeat a pre-created world-writable
    // squat (r13 review): verify the root is actually ours before any
    // index lands in it — fail loudly, never write into a directory
    // another principal controls
    val owner = try java.nio.file.Files.getOwner(base).getName
                catch { case _: UnsupportedOperationException => user }
    require(owner == user,
      s"stable scratch root $base is owned by '$owner', not '$user' — " +
        "refusing to place stored indexes in a directory another " +
        "principal controls")
    base
  }

  /** STABLE scratch path (no random suffix) for build/probe pairs that
    * run in separate calls and must agree on the location — the stored
    * index registry entries and their StoredSplits twins. Medium and
    * namespace come from [[stableBase]] (memoized per JVM, per-user);
    * the caller's write mode ("overwrite") owns staleness.
    */
  def stableDir(leaf: String): String = stableBase.resolve(leaf).toString
}
