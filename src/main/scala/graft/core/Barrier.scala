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
  *    blocks live until released.
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
  *
  * [[releaseAll]] is BARRIER-SCOPED: every `apply` records exactly the
  * blocks it created (the persisted Dataset, or the RDD ids the local
  * checkpoint parked), and release drops only those. Caller-owned caches
  * (a benchmark signature table `cache()`d for a whole streaming job, a
  * notebook's persisted working set) are never touched — session-wide
  * `clearCache` would silently evict them, and a caller-held
  * localCheckpoint has no lineage to recompute from at all.
  */
object Barrier {

  val ConfKey = "spark.graft.reuseBarrier"

  private val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
  private val ckptRddIds = scala.collection.mutable.Set.empty[Int]

  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey).getOrElse("localCheckpoint") match {
      case "persist" =>
        val p = df.persist(StorageLevel.DISK_ONLY)
        // materialize now: downstream readers hit the store instead of
        // racing to populate it, mirroring localCheckpoint's eagerness
        p.queryExecution.toRdd.count()
        synchronized { persisted += p }
        p
      case _ =>
        val sc = df.sparkSession.sparkContext
        val before = sc.getPersistentRDDs.keySet
        val out = df.localCheckpoint()
        val created = sc.getPersistentRDDs.keySet.diff(before)
        synchronized { ckptRddIds ++= created }
        out
    }

  /** `df.barrier()` chain syntax at call sites. */
  implicit class BarrierOps(private val df: DataFrame) extends AnyVal {
    def barrier(): DataFrame = Barrier(df)
  }

  /** Drop every block a [[apply]] call created in this JVM — and nothing
    * else (see class doc). Safe to call repeatedly.
    */
  def releaseAll(s: SparkSession): Unit = synchronized {
    persisted.foreach { p =>
      try { p.unpersist(blocking = false); () } catch { case _: Throwable => }
    }
    persisted.clear()
    val registry = s.sparkContext.getPersistentRDDs
    ckptRddIds.foreach(id =>
      registry.get(id).foreach(_.unpersist(blocking = false)))
    ckptRddIds.clear()
  }
}
