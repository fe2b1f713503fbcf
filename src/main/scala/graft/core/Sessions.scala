package graft.core

import org.apache.spark.sql.SparkSession

/** One place for the engine's session defaults: UTC (oracle parity), AQE
  * (runtime re-plan + skew split), shuffle partitions sized to the env
  * (32 locally; cluster-sized in prod), graft extensions registered.
  */
object Sessions {

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      : SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
