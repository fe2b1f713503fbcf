package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by operator modules (graft.operators.*); each
  * module pairs every query with DuckDB oracle SQL over the same fixture
  * tables. COVERAGE.md maps SURVEY §2 operator ids → query names.
  */
object SparkEntry {

  private val modules: Seq[OpModule] = Seq(
    Relational, Windows, TextAnalysis, CdcOps, LogSplit,
    Stateful, Dedup, Similarity, Multimodal)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.2 slice: filter → 10s tumbling window → count.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("a1_tumble_count")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
