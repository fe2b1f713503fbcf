package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off diagnostic for the mm_decode_features bench instability
  * (VERDICT r14 #4): measures the query's input partition count and its
  * repeated-run spread as-is vs explicitly repartitioned to core count.
  * Usage: runMain graft.tools.MmDiag <sfDir> [runs]
  */
object MmDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet").queryExecution.toRdd.count()
    val q = graft.SparkEntry.queries("mm_decode_features")
    val df = q(spark, dir)
    println(s"[mmdiag] plan partitions=${df.queryExecution.toRdd.getNumPartitions}")
    def timeIt(label: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        f().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[mmdiag] $label%-12s ${ts.map(t => f"$t%.3f").mkString("[", ",", "]")} " +
        f"min=${ts.min}%.3f med=${ts.sorted.apply((ts.size - 1) / 2)}%.3f " +
        f"spread(after-first)=${ts.drop(1).max / ts.drop(1).min}%.2fx")
    }
    timeIt("as-is", () => q(spark, dir))
    spark.stop()
  }
}
