package graft.core

import org.apache.spark.sql.DataFrame
import scala.collection.mutable.ArrayBuffer

/** Cache-lifetime contract for registry queries.
  *
  * A handful of query builders `persist()` a projection that is reused
  * across jobs inside one query (the q38/q39/q67 sketch frames, q62's
  * parsed metadata). The persist is the right plan — but a DataFrame is
  * lazy, so the builder cannot know when the caller has finished
  * materializing it, and a raw `unpersist()` before returning would
  * evict the cache before it is ever used. Without a contract, a library
  * user composing registry queries accumulates cached relations silently.
  *
  * The contract: builders persist through [[tracked]]; callers wrap
  * build + materialization in [[scoped]], which unpersists every tracked
  * frame on the way out (success or failure — the ResumableSink
  * try/finally shape). Outside any scope, [[tracked]] degrades to a plain
  * `persist()` so ad-hoc exploration still caches; long-lived callers
  * should then clear the session cache themselves, as Bench/Verify
  * always have.
  *
  * Thread-local because a builder runs on the thread that called it —
  * concurrent callers (a multi-tenant driver) each get their own scope.
  * Scopes nest: frames are released by the scope that was active when
  * they were tracked.
  */
object CacheScope {

  private val active = new ThreadLocal[ArrayBuffer[DataFrame]]

  /** Persist `df` and register it for release at the end of the
    * enclosing [[scoped]] block (plain persist when no scope is active).
    */
  def tracked(df: DataFrame): DataFrame = {
    df.persist()
    val scope = active.get()
    if (scope != null) scope += df
    df
  }

  /** True when a scope is active on this thread (spec hook). */
  def inScope: Boolean = active.get() != null

  /** Run `body` (typically: build a registry query AND materialize it),
    * then unpersist every frame [[tracked]] inside it. Non-blocking
    * unpersist — eviction proceeds asynchronously, the entries leave the
    * cache registry immediately.
    */
  def scoped[A](body: => A): A = {
    val outer = active.get()
    val scope = new ArrayBuffer[DataFrame]
    active.set(scope)
    try body
    finally {
      if (outer == null) active.remove() else active.set(outer)
      scope.foreach(_.unpersist(blocking = false))
    }
  }
}
