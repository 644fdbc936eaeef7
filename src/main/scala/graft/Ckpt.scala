package graft

import org.apache.spark.sql.DataFrame

/** Eager materialization + lineage truncation for operator-internal
  * reuse points and iterative loops.
  *
  * Why not `cache()`: Spark SQL's CacheManager holds cached plans
  * until an explicit `unpersist()`, so an operator that caches
  * internally and returns a lazy frame leaks its working memory into
  * a long-lived session (a 55-query bench in one SparkSession
  * accumulated every LSH band frame ever cached, evicting working
  * memory — the round-2 "Asked to cache already cached data" churn).
  * A checkpointed frame's blocks are instead released by the
  * ContextCleaner as soon as the frame is no longer referenced — no
  * lifecycle to thread through callers, nothing outlives its query.
  *
  * Local vs reliable: by default this is `localCheckpoint()` (blocks
  * on the executors — lost on executor failure, which is fine
  * single-node and for bench runs). Setting `spark.graft.checkpointDir`
  * switches every call site to reliable `checkpoint()` on shared
  * storage, which is REQUIRED at cluster scale for iterative loops
  * (d7's label propagation): a lost executor otherwise has no lineage
  * to recompute from.
  */
object Ckpt {
  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
}
