package graft.model

/** The one recursive-delete helper (r17 review: three hand-rolled
  * copies — Verify, the stream-stream-join scratch wipe, the test
  * SyntheticEmbeddings — each with slightly different failure
  * behavior, so a robustness fix to one never reached the others). */
object Fs {

  /** Delete `f` and everything under it. Failures are LOUD, not
    * swallowed: a scratch dir that survives a wipe poisons the next
    * run (a stale streaming checkpoint referencing overwritten input
    * either dies on missing files or silently skips rows), and a
    * discarded `delete()` boolean gives that failure no log line.
    * `listFiles` is null-guarded (it returns null on IO error or a
    * concurrent delete, not an empty array). */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    if (!f.delete() && f.exists())
      System.err.println(s"[graft.Fs] failed to delete ${f.getPath}")
  }

  /** [[deleteRecursively]] by path; returns the path for chaining. */
  def wipe(path: String): String = {
    deleteRecursively(new java.io.File(path))
    path
  }
}
