package graft.tools

import org.apache.spark.sql.SparkSession

/** The r14 p7 footprint experiment (VERDICT r14 #5): is
  * p7_map_projection's median inflation in loaded sessions a cost of the
  * session's loaded-code/JIT/GC footprint, or ambient noise?
  *
  * Mode "cold":   time p7 N times in a session that never touches any
  *                other module (only CdcOps classes load).
  * Mode "loaded": run the full 23-query headline once first (loading and
  *                JITing the whole surface), then time the same N runs.
  * Same JVM options, same SF, same stat. If the loaded-session median is
  * consistently +15-25% over cold at MIN-parity, the footprint
  * hypothesis is confirmed; if parity, refuted.
  * Usage: runMain graft.tools.P7Diag <cold|loaded> [sfDir] [runs]
  */
object P7Diag {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("cold")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet").queryExecution.toRdd.count()
    def once(q: String, m: Map[String, (SparkSession, String) =>
        org.apache.spark.sql.DataFrame]): Double = {
      val t0 = System.nanoTime()
      m(q)(spark, dir).queryExecution.toRdd.count()
      val t = (System.nanoTime() - t0) / 1e9
      graft.core.Barrier.releaseAll(spark)
      t
    }
    if (mode == "loaded")
      graft.Bench.headline.foreach(q => once(q, graft.SparkEntry.queries))
    // cold mode touches ONLY CdcOps — SparkEntry.queries would init
    // every module object and flatMap all nine maps
    val p7Map = graft.operators.CdcOps.queries
    val ts = (1 to runs).map(_ => once("p7_map_projection", p7Map))
    val steady = ts.drop(2)
    println(f"[p7diag] mode=$mode runs=${ts.map(t => f"$t%.3f").mkString("[", ",", "]")}")
    println(f"[p7diag] mode=$mode min=${steady.min}%.3f " +
      f"med=${steady.sorted.apply((steady.size - 1) / 2)}%.3f " +
      f"mean=${steady.sum / steady.size}%.3f (steady = runs 3..N)")
    spark.stop()
  }
}
