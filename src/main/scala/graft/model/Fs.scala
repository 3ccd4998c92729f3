package graft.model

/** The one recursive-delete helper (r17 review: three hand-rolled
  * copies — Verify, the stream-stream-join scratch wipe, the test
  * SyntheticEmbeddings — each with slightly different failure
  * behavior, so a robustness fix to one never reached the others). */
object Fs {

  /** Delete `f` and everything under it; returns whether NOTHING of
    * `f` survives (r17 ADVICE: the void-returning version only logged
    * a failed delete, so Verify's stale-output guard could proceed
    * and green-light a previous run's parquet — the exact failure the
    * guard exists to prevent). Failures are LOUD, not swallowed: a
    * scratch dir that survives a wipe poisons the next run (a stale
    * streaming checkpoint referencing overwritten input either dies
    * on missing files or silently skips rows). `listFiles` is
    * null-guarded (it returns null on IO error or a concurrent
    * delete, not an empty array — which also means "don't know", so
    * it counts as failure when the dir then survives). */
  def deleteRecursively(f: java.io.File): Boolean = {
    var ok = true
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(c => ok &= deleteRecursively(c))
      else ok = false
    }
    if (!f.delete() && f.exists()) {
      System.err.println(s"[graft.Fs] failed to delete ${f.getPath}")
      ok = false
    }
    // a file that no longer exists is a successful wipe regardless of
    // child bookkeeping (a concurrent deleter finishing first is fine)
    ok || !f.exists()
  }

  /** [[deleteRecursively]] by path; returns the path for chaining.
    * Best-effort: callers that must not proceed past a failed wipe use
    * [[wipeOrThrow]]. */
  def wipe(path: String): String = {
    deleteRecursively(new java.io.File(path))
    path
  }

  /** [[wipe]] that THROWS on a surviving path — for guards whose whole
    * purpose is "stale state must not outlive this call" (Verify's
    * stale-output guard, streaming checkpoint wipes). */
  def wipeOrThrow(path: String): String = {
    if (!deleteRecursively(new java.io.File(path)))
      throw new java.io.IOException(s"wipe failed, stale state survives: $path")
    path
  }

  /** Deterministic-per-(JVM, fixture) scratch dir: stable across bench
    * reps inside one process (each rep overwrite-wipes it, keeping the
    * query's cost flat), but unique ACROSS processes via the pid —
    * r17 ADVICE: two concurrent JVMs on the same fixture (Verify and
    * Bench overlapping) used to share one deterministic path and wipe
    * each other's wire/checkpoint/output mid-run, corrupting both.
    *
    * Every returned path registers a ONE-TIME JVM shutdown wipe (r18
    * review): pid-unique paths mean no later process ever reuses —
    * or cleans — this one's dirs, so without the hook each
    * Verify/Bench/test JVM would permanently accrete sf-scale wire
    * data under /tmp (the 'suite runs must not accrete parquet'
    * rule the test fixtures already enforce with the same hook). */
  def scratchDir(prefix: String, fixture: String): String = {
    val path = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft-$prefix-p${ProcessHandle.current().pid()}-" +
        fixture.replaceAll("[^A-Za-z0-9.]+", "_")).getAbsolutePath
    if (scratchRegistered.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        deleteRecursively(new java.io.File(path)); ()
      }))
    path
  }
  private val scratchRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
