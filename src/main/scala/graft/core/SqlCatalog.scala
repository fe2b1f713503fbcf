package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-API surface — the analog of the reference's `BaseSQLApp`/
  * `SQLUtil.createTopicDb` (ref base/BaseSQLApp.java:24-81,
  * util/SQLUtil.java:14-37): register every fixture table as a temp view so
  * pipelines can be written as literal `spark.sql` text. Same Catalyst
  * plans as the DataFrame API — the two surfaces are interchangeable.
  */
object SqlCatalog {

  /** Register all fixture tables of `dir` as temp views. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Run a SQL pipeline against the registered views. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(query)
  }
}
