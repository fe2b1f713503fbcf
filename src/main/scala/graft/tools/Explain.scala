package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Plan-audit utility: print the formatted physical plan of named driver
  * queries (all of them with no filter). The PLANS.md audits are written
  * from this output, not from memory.
  *
  * Usage: runMain graft.tools.Explain <sfDir> [q1,q2,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.lift(1).map(_.split(",").toSet)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try fn(spark, dir).explain("formatted")
        catch { case e: Throwable =>
          println(s"[explain] $name failed: ${e.getMessage}")
        }
        finally graft.core.Barrier.releaseAll(spark)
      }
    spark.stop()
  }
}
