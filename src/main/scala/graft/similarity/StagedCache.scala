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
  * end of the body). `release` drains EVERYTHING registered so far —
  * unpersisting a not-yet-materialized lazy cache is semantically a
  * no-op (the plan recomputes), so a concurrent query's entry caught in
  * the drain costs at most a recompute, never a wrong answer.
  */
object StagedCache {
  private val staged =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Record `df` (already `.persist()`-ed) for a later [[release]]. */
  def register[T](df: Dataset[T]): Dataset[T] = { staged.add(df); df }

  /** Unpersist (non-blocking) every registered entry; returns how many
    * were drained. Idempotent — entries drain exactly once. */
  def release(): Int = {
    var n = 0
    var d = staged.poll()
    while (d != null) { d.unpersist(false); n += 1; d = staged.poll() }
    n
  }

  /** Currently-registered entry count (spec hook). */
  def pending: Int = staged.size()
}
