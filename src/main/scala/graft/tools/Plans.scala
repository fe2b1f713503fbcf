package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dumps the formatted physical plan of each headline query to stdout —
  * source for the PLANS.md audit.
  * Usage: runMain graft.tools.Plans <sfDir> [query ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq else graft.Bench.headline
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => println(s"error: ${e.getMessage}") }
    }
    spark.stop()
  }
}
