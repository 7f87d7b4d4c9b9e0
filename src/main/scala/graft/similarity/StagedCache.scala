package graft.similarity

import org.apache.spark.sql.Dataset

/** Registry for `persist()`-staged INTERNAL tables (the banded
  * self-join inputs of [[Similarity.simhashPairsFromSigs]] /
  * [[PortableSim]]): those functions must stage lazily at DataFrame
  * construction (no job, lineage intact — the no-job-at-construction
  * contract PortableSimSpec pins), which means they cannot unpersist —
  * the consumer hasn't run yet. One-shot batch callers never notice
  * (session teardown reclaims the entries), but a STREAMING loop that
  * rebuilds the plan every trigger (e.g.
  * [[graft.streaming.StreamingMedia.admitVideos]] re-pairing per batch)
  * would accumulate one cache entry per trigger for the life of the
  * session.
  *
  * The contract: staging functions [[register]] what they persist;
  * loop-shaped callers call [[release]] once the trigger's outputs are
  * materialized (foreachBatch bodies here materialize via eager
  * `localCheckpoint(true)` before sinking, so release is safe at the
  * end of the body).
  *
  * Registrations are SCOPED by an owner token ([[scoped]]): with two
  * concurrent pipelines in one session (a stream alongside a batch
  * [[graft.multimodal.MediaPipeline]] run, or two streams), an unscoped
  * session-global drain would unpersist a banded table another pipeline
  * registered but has not yet materialized — silently turning its
  * persist into a recompute per consumer, the exact cost the persist
  * exists to avoid (correct results, degraded perf). A loop-shaped
  * caller wraps its trigger body in `scoped(token) { … }`; register
  * tags entries with the AMBIENT scope, and `release()` drains only the
  * current scope's entries. Code outside any scope shares the default
  * scope — the pre-scoping behavior, unchanged for one-shot callers.
  * Draining a not-yet-materialized lazy cache remains semantically a
  * no-op (the plan recomputes), so even a mis-scoped drain can cost at
  * most a recompute, never a wrong answer.
  */
object StagedCache {

  private val DefaultScope = "global"

  private val staged = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]]()

  // DynamicVariable: thread-bound with inheritance into worker threads
  // spawned inside the scope, so a scoped body that parallelizes its
  // construction (the parLayers shape) still tags its own entries
  private val scope = new scala.util.DynamicVariable[String](DefaultScope)

  private def queueOf(key: String) =
    staged.computeIfAbsent(key,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]())

  /** Run `body` with registrations (and bare [[release]] calls) bound
    * to `key` — one token per pipeline instance; a fresh UUID-suffixed
    * token per operator call is the convention.
    *
    * THREAD CONTRACT: the binding is a DynamicVariable
    * (InheritableThreadLocal) — it reaches only the scoping thread and
    * threads CREATED inside the body (the parLayers shape). Work
    * dispatched to a PRE-EXISTING shared pool (a reused
    * ExecutionContext, Spark listener/callback threads) does NOT
    * inherit it and would register into the default scope, which this
    * pipeline's drain never touches — a slow persisted-cache leak.
    * Such code must capture [[currentScope]] on the scoping thread and
    * register with the explicit-owner overload
    * ([[register[T](df:org\.apache\.spark\.sql\.Dataset[T],owner:String)* register(df, owner)]])
    * instead of relying on ambient state. */
  def scoped[T](key: String)(body: => T): T = scope.withValue(key)(body)

  /** The ambient scope key (spec hook; also what shared-pool work
    * should capture BEFORE dispatching — see [[scoped]]'s thread
    * contract). */
  def currentScope: String = scope.value

  /** Record `df` (already `.persist()`-ed) under the ambient scope for
    * a later [[release]]. Must run on the scoping thread or a thread
    * spawned within the scope — from a pre-existing shared pool, use
    * the explicit-owner overload with a captured [[currentScope]]. */
  def register[T](df: Dataset[T]): Dataset[T] = {
    queueOf(scope.value).add(df); df
  }

  /** [[register]] with an EXPLICIT owner token — the shared-pool-safe
    * form: ambient thread-local state never reaches threads created
    * outside the scope, so code that stages from one captures the
    * token on the scoping thread and passes it through the call chain
    * instead. Drained by `release(owner)`. */
  def register[T](df: Dataset[T], owner: String): Dataset[T] = {
    queueOf(owner).add(df); df
  }

  /** Unpersist (non-blocking) every entry registered under the ambient
    * scope; returns how many were drained. Idempotent — entries drain
    * exactly once; other scopes' entries are never touched. */
  def release(): Int = release(scope.value)

  /** [[release]] for an explicit owner token. */
  def release(key: String): Int = {
    val q = staged.get(key)
    if (q == null) 0
    else {
      var n = 0
      var d = q.poll()
      while (d != null) { d.unpersist(false); n += 1; d = q.poll() }
      n
    }
  }

  /** Registered-entry count across ALL scopes (spec hook — the leak
    * audit asserts this reaches 0 after a loop drains). */
  def pending: Int = {
    var n = 0
    staged.forEach((_, q) => n += q.size())
    n
  }

  /** Registered-entry count for one scope (spec hook). */
  def pendingIn(key: String): Int = {
    val q = staged.get(key); if (q == null) 0 else q.size()
  }
}
