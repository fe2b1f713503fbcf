package graft.tools

import org.apache.spark.sql.SparkSession

/** Scan-split parallelism experiment: the sf fixtures are single parquet
  * files, and the default 4 MB openCostInBytes packs them into a handful
  * of scan splits — far fewer than cores. Measures headline scan-bound
  * queries under the default vs a smaller openCost.
  * Usage: runMain graft.tools.SplitDiag <sfDir> <openCostBytes> [runs] [queries]
  */
object SplitDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val openCost = args.lift(1).getOrElse("4194304")
    val runs = args.lift(2).map(_.toInt).getOrElse(6)
    val qs = args.lift(3).map(_.split(",").toSeq).getOrElse(
      Seq("q1_pricing_summary", "j1_order_lineitem_join", "u1_tokenize_explode"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.files.openCostInBytes", openCost)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet").queryExecution.toRdd.count()
    qs.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val nIn = df.queryExecution.toRdd.getNumPartitions
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        graft.core.Barrier.releaseAll(spark)
        t
      }
      val steady = ts.drop(1)
      println(f"[split] openCost=$openCost $q%-26s outParts=$nIn " +
        f"med=${steady.sorted.apply((steady.size - 1) / 2)}%.3f min=${steady.min}%.3f " +
        ts.map(t => f"$t%.2f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
