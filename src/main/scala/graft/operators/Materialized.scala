package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Multi-consumer materialization WITHOUT a CacheManager entry.
 *
 * `Dataset.persist` registers the plan in the session's CacheManager and
 * pins the blocks until someone calls `unpersist` — but an operator that
 * RETURNS a lazy DataFrame has no point at which it can unpersist (the
 * caller consumes the result only after the function exits), so every
 * such persist is a session-lifetime storage leak (found by the round-5
 * audit on the simhash pair operators).
 *
 * `localCheckpoint(eager = true)` gives the same reuse — one
 * computation, blocks served to every downstream consumer — with
 * RDD-owned storage: the ContextCleaner releases the blocks once the
 * checkpointed RDD becomes unreachable, i.e. when callers drop the
 * returned frame. No explicit release call, no CacheManager entry
 * (asserted by CacheHygieneSpec).
 *
 * Deliberate trade-offs: (a) materialization is EAGER — one job runs at
 * operator-build time, the same work `persist` would have done inside
 * the first action; (b) lineage is truncated, so an executor lost during
 * a later read fails the job instead of recomputing — acceptable for the
 * small derived index relations this library materializes (fingerprints,
 * signatures, norms: a few longs/doubles per document), which are
 * rebuilt simply by re-running the operator. Operators that consume
 * their own intermediates BEFORE returning (e.g. `stageStats`,
 * `Match.run`'s LLM band) keep persist + try/finally unpersist instead.
 */
object Materialized {
  def apply(df: DataFrame): DataFrame = df.localCheckpoint()
}
