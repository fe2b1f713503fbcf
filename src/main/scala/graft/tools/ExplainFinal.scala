package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Post-execution plan audit: runs named queries and prints the FINAL
  * adaptive plan (AQE reuse/broadcast/coalesce decisions are runtime
  * state — the static `explain` shows none of them).
  * Usage: runMain graft.tools.ExplainFinal <sfDir> q1[,q2,...]
  */
object ExplainFinal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.lift(1).map(_.split(",").toSet)
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n===== $name (final adaptive plan) =====")
        try {
          val df = fn(spark, dir)
          df.queryExecution.toRdd.count()
          println(df.queryExecution.executedPlan.toString)
        } catch { case e: Throwable =>
          println(s"[explain-final] $name failed: ${e.getMessage}")
        }
        finally graft.core.Barrier.releaseAll(spark)
      }
    spark.stop()
  }
}
