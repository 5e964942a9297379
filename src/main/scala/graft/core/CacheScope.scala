package graft.core

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset

/** Lifecycle scoping for query-internal `persist()` calls.
  *
  * Some queries legitimately cache an intermediate frame (q39's shared
  * trigram aggregate, q45's training sample, q56/q57's shingle sets):
  * several downstream branches re-read it and recomputing would multiply
  * the most expensive stage. But a `DataFrame`-returning query cannot
  * `unpersist` its own cache — the result is lazy, so the cache must
  * outlive query *construction* and die only after the caller's action.
  *
  * `CacheScope` makes that contract explicit and leak-free: queries
  * register every internal persist via [[track]], and the session owner
  * (Bench, Verify, a library caller) runs each query inside [[withScope]],
  * which unpersists exactly the frames tracked within — nothing else in
  * the session. This replaces the former blunt
  * `sharedState.cacheManager.clearCache()`, which also evicted every
  * caller-owned cache. Outside any scope, [[track]] is a no-op register
  * (the persist still works); the session owner then owns cleanup.
  *
  * Thread-local by design: query construction and the subsequent action
  * happen on the caller's thread; Spark's task threads never touch it.
  */
object CacheScope {
  private val scopes = new ThreadLocal[ArrayBuffer[Dataset[_]]]

  /** Register a persisted frame with the innermost active scope (no-op
    * without one). Returns the frame for inline use.
    */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    val buf = scopes.get()
    if (buf != null) buf += ds
    ds
  }

  private val cleanups = new ThreadLocal[ArrayBuffer[() => Unit]]

  /** Register an arbitrary cleanup with the innermost scope — for
    * resources `Dataset.unpersist` can't reach (e.g. the RDD blocks
    * behind a `localCheckpoint`, see ConnectedComponents). No-op without
    * an active scope.
    */
  def defer(cleanup: () => Unit): Unit = {
    val buf = cleanups.get()
    if (buf != null) buf += cleanup
  }

  /** Run `body` (construct a query AND run its action), then unpersist
    * every frame tracked inside and run every deferred cleanup —
    * targeted, non-blocking, other session caches untouched. Scopes
    * nest; each releases only its own.
    */
  def withScope[A](body: => A): A = {
    val prevT = scopes.get()
    val prevC = cleanups.get()
    val bufT = new ArrayBuffer[Dataset[_]]
    val bufC = new ArrayBuffer[() => Unit]
    scopes.set(bufT)
    cleanups.set(bufC)
    try body
    finally {
      bufT.foreach { ds =>
        try ds.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
      bufC.foreach { c =>
        try c() catch { case _: Throwable => () }
      }
      scopes.set(prevT)
      cleanups.set(prevC)
    }
  }
}
