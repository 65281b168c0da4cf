package graft.io

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset

/** Registry pairing every internal `.persist()` with a deterministic
  * release point. Query builders return LAZY frames, so they cannot
  * unpersist the intermediates they cache — the cache must outlive the
  * builder and survive until the caller materializes the result. The
  * contract: builders cache through [[persistScoped]], and every
  * materialization site (Verify, Bench, the DistMain task runner, any
  * embedding application) calls [[releaseAll]] once its action
  * completes. Releasing is idempotent, so builders that ALSO unpersist
  * eagerly (e.g. per-round fixpoint caches) may still do so.
  *
  * Concurrency contract: the registry is process-global, so build →
  * materialize → releaseAll is a SERIAL protocol per session — exactly
  * how Verify/Bench/DistMain run. An application materializing several
  * graft queries concurrently on one session must not call releaseAll
  * mid-flight (it would drop a sibling query's caches and force
  * recompute — correct results, wasted work); it should release once
  * all in-flight actions finish, or fall back to
  * `spark.catalog.clearCache()` at its own quiesce points.
  *
  * At cluster scale this is what keeps a long-lived session from
  * accumulating corpus-sized cached partitions across queries —
  * `spark.catalog.clearCache()` would work too, but it nukes caches the
  * embedding application owns; this releases only what graft created. */
object CacheScope {

  private val tracked = new ConcurrentLinkedQueue[Dataset[_]]()

  /** `.persist()` + register for the next [[releaseAll]]. */
  implicit final class Persisted[T](private val ds: Dataset[T]) extends AnyVal {
    def persistScoped(): Dataset[T] = {
      ds.persist()
      tracked.add(ds)
      ds
    }
  }

  /** Unpersist (non-blocking) every frame persisted through
    * [[Persisted.persistScoped]] since the last call. */
  def releaseAll(): Unit = {
    var ds = tracked.poll()
    while (ds != null) {
      ds.unpersist(blocking = false)
      ds = tracked.poll()
    }
  }
}
