package graft

/** Filesystem helpers shared by the sources and the staging code.
  *
  * `java.nio.file.Files.list` returns a Stream backed by an OPEN
  * DirectoryStream; consuming it without closing leaks a directory
  * file descriptor for the JVM's lifetime. The harness mains call the
  * staging/write paths hundreds of times per session (warmup + 3-5
  * bench runs x 138 queries), so the leak is real fd pressure, not a
  * theoretical nit — every directory listing goes through this
  * close-guaranteed wrapper. */
object Fs {
  def listDir[A](p: java.nio.file.Path)(
      f: java.util.stream.Stream[java.nio.file.Path] => A): A = {
    val s = java.nio.file.Files.list(p)
    try f(s) finally s.close()
  }

  /** Recursive delete (idempotent on a missing path) — the shared form
    * of the per-query sink/checkpoint cleanup that q84 and the keyed
    * upsert sink previously each inlined. */
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p))
      listDir(p)(_.forEach(deleteRecursively(_)))
    java.nio.file.Files.deleteIfExists(p)
  }
}
