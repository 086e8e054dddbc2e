package graft.queries

/** Stage-once fixture directories for the source-scan queries.
  *
  * The scan queries (q43, q52-q56) exercise the READ path — scan + parse +
  * normalize — but their wire files are deterministic functions of the test
  * tables, so generating them is test setup, not the operator under test.
  * Each generator runs only when its fixture is absent (keyed by sf dir plus
  * a format-version suffix so format changes invalidate old files), and
  * `Bench` pre-stages everything in its untimed warmup via the per-module
  * `stageAll` hooks, leaving the timed region to measure the scan path the
  * way a cluster job would see it: files already on storage.
  */
object Staging {
  def dir(sfDir: String, name: String): String =
    s"/tmp/graft_sources/${new java.io.File(sfDir).getName}/$name"

  /** Write-if-absent. `write(path)` must end in a Spark write (its
    * `_SUCCESS` marker is the staged-complete flag; a partial write without
    * the marker is re-staged on the next call).
    */
  def once(sfDir: String, name: String)(write: String => Unit): String = {
    val path = dir(sfDir, name)
    if (!new java.io.File(path, "_SUCCESS").exists()) write(path)
    path
  }
}
