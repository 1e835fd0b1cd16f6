package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

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
 * The DEFAULT strategy, `localCheckpoint(eager = true)`, gives the same
 * reuse — one computation, blocks served to every downstream consumer —
 * with RDD-owned storage: the ContextCleaner releases the blocks once
 * the checkpointed RDD becomes unreachable, i.e. when callers drop the
 * returned frame. No explicit release call, no CacheManager entry
 * (asserted by CacheHygieneSpec).
 *
 * Deliberate trade-offs of the default: (a) materialization is EAGER —
 * one job runs at operator-build time, the same work `persist` would
 * have done inside the first action; (b) lineage is truncated, so an
 * executor lost while a downstream stage reads the checkpointed blocks
 * fails the job instead of recomputing — acceptable for the small
 * derived index relations this library materializes (fingerprints,
 * signatures, norms: a few longs/doubles per document), which are
 * rebuilt simply by re-running the operator. On a preemptible-node
 * cluster where that retry cost is unacceptable, select a different
 * strategy via the session conf (see [[Materialized.ConfKey]]):
 *
 *  - `localCheckpoint` (default): as above.
 *  - `persist`: `MEMORY_AND_DISK` persist with CALLER-owned lifecycle —
 *    lineage stays intact (executor loss recomputes instead of
 *    failing), but the CacheManager entry outlives the operator call;
 *    release it with `df.unpersist()` or sweep everything this object
 *    registered via [[Materialized.releaseAll]] (or
 *    `spark.catalog.clearCache()`).
 *  - `none`: no materialization — the plan is re-evaluated per
 *    consumer. Correct (every consumer sees the same deterministic
 *    plan), sensible when inputs are cheap scans and cluster memory is
 *    the scarce resource.
 *
 * Operators that consume their own intermediates BEFORE returning
 * (e.g. `stageStats`, `Match.run`'s LLM band) keep persist +
 * try/finally unpersist regardless of this setting.
 */
object Materialized {

  /** Session conf selecting the strategy:
    * `localCheckpoint` (default) | `persist` | `none`. */
  val ConfKey = "spark.graft.materialize.strategy"

  /** Frames persisted under the `persist` strategy, per session — the
    * sweep target for [[releaseAll]]. Weak session keys are unnecessary:
    * entries are removed on release, and a session's list dies with the
    * JVM-lifetime registry at worst. */
  private val owned =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      java.util.Queue[DataFrame]]()

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ConfKey, "localCheckpoint") match {
      case "localCheckpoint" => df.localCheckpoint()
      case "persist" =>
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        owned.computeIfAbsent(spark,
          _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]())
          .add(p)
        p
      case "none" => df
      case other => throw new IllegalArgumentException(
        s"$ConfKey=$other: expected localCheckpoint | persist | none")
    }
  }

  /** Unpersist every frame this object registered for `spark` under the
    * `persist` strategy. Returns the number released. */
  def releaseAll(spark: SparkSession): Int = {
    val q = owned.remove(spark)
    if (q == null) 0
    else {
      var n = 0
      var df = q.poll()
      while (df != null) { df.unpersist(); n += 1; df = q.poll() }
      n
    }
  }
}
