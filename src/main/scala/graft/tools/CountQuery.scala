package graft.tools

import org.apache.spark.sql.SparkSession

/** Count a query's output rows at a given dir — the output-bound vs
  * candidate-bound discriminator for scale readings.
  * Usage: runMain graft.tools.CountQuery <dir> <q1,q2,...>
  */
object CountQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq.empty)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // match the scale harness's content-diversity knob when counting at a
    // scaled dir (Scaling sets classes = 100·k; see scaled())
    sys.env.get("SPARK_GRAFT_MM_CLASSES")
      .foreach(spark.conf.set("spark.graft.mmClasses", _))
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.toRdd.count()
      println(f"[count] $n%-26s rows=$c (${(System.nanoTime() - t0) / 1e9}%.1fs)")
      graft.core.Barrier.releaseAll(spark)
    }
    spark.stop()
  }
}
