package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** THE reuse barrier — the one place that decides how a relation that is
  * read several times downstream (dedup signature tables, LSH bucket
  * relations, merge outputs) gets materialized.
  *
  * Two modes, selected by the `spark.graft.reuseBarrier` conf:
  *
  *  - `localCheckpoint` (default, right for local[n]): truncates lineage
  *    into the block manager. Fastest single-JVM barrier, but an executor
  *    loss on a real cluster kills the job (no lineage to recompute), and
  *    blocks live until the session drops them.
  *  - `persist`: `persist(DISK_ONLY)` + eager materialization. Keeps
  *    lineage (executor loss recomputes only lost blocks), never competes
  *    with execution memory, and releases deterministically via
  *    [[releaseAll]]. The cluster-mode choice.
  *
  * Lifecycle: barrier blocks are NOT free — SCALING.md measured a later
  * query inflating 2× at 16× data purely from accumulated barrier storage.
  * Long-lived sessions that run many queries back-to-back (Bench, Scaling,
  * a notebook) must call [[releaseAll]] between queries; per-query driver
  * runs (Verify) get release for free when the session stops.
  */
object Barrier {

  val ConfKey = "spark.graft.reuseBarrier"

  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey).getOrElse("localCheckpoint") match {
      case "persist" =>
        val p = df.persist(StorageLevel.DISK_ONLY)
        // materialize now: downstream readers hit the store instead of
        // racing to populate it, mirroring localCheckpoint's eagerness
        p.queryExecution.toRdd.count()
        p
      case _ => df.localCheckpoint()
    }

  /** `df.barrier()` chain syntax at call sites. */
  implicit class BarrierOps(private val df: DataFrame) extends AnyVal {
    def barrier(): DataFrame = Barrier(df)
  }

  /** Drop every barrier block of the session — cached plans and persistent
    * RDDs (localCheckpoint parks its blocks as persistent RDDs, so both
    * modes release through the same call).
    */
  def releaseAll(s: SparkSession): Unit = {
    s.sharedState.cacheManager.clearCache()
    s.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
