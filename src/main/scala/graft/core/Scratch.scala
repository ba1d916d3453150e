package graft.core

/** Scratch-root resolution for per-run artifacts (snapshot indexes,
  * format-roundtrip files): prefer the RAM-backed tmpfs when one is
  * writable — these artifacts live only for the duration of a run and
  * are rebuilt (mode=overwrite) on every invocation, so durability is
  * irrelevant while create/rename/commit latency on a slow local disk
  * is pure overhead. Falls back to java.io.tmpdir. */
object Scratch {
  lazy val root: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) "/dev/shm" else sys.props("java.io.tmpdir")
  }
}
