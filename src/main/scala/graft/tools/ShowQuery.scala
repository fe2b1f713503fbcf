package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Result-audit utility: run named driver queries against any fixture
  * dir (including the /tmp scale-sweep dirs Scaling materializes) and
  * print up to N rows. The SCALING.md recall/quality readings at k× are
  * written from this output, not from memory.
  *
  * Usage: runMain graft.tools.ShowQuery <sfDir> <q1,q2,...> [maxRows]
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq.empty)
    val maxRows = args.lift(2).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n===== $name =====")
      try SparkEntry.queries(name)(spark, dir).show(maxRows, truncate = false)
      catch { case e: Throwable =>
        println(s"[show] $name failed: ${e.getMessage}")
      }
      finally graft.core.Barrier.releaseAll(spark)
    }
    spark.stop()
  }
}
