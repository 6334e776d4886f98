package graft.streaming

/** Scratch-directory provider for the bounded drains and the ephemeral
  * stored-index builds: prefers a RAM-backed filesystem (/dev/shm) over
  * `java.io.tmpdir` when present and writable.
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
  * absent (containers/mac). The INPUT tables are never moved — only
  * per-query scratch lands here.
  */
object DrainWork {
  private lazy val base: Option[java.nio.file.Path] = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm)) Some(shm)
    else None
  }

  def tempDir(prefix: String): String = base match {
    case Some(b) => java.nio.file.Files.createTempDirectory(b, prefix).toString
    case None    => java.nio.file.Files.createTempDirectory(prefix).toString
  }
}
