package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The DWD log path: ETL + five-way splitter + array explosion + config
  * routing.
  *
  * P2 log ETL                 (ref DwdBaseLog.java:216-239)
  * X1 side-output splitter    (ref DwdBaseLog.java:76-152)
  * X2 config-driven router    (ref DwdBaseDb.java:100-145)
  * K2 dynamic-topic routing   (ref FlinkSinkUtil.java:44-60)
  *
  * Flink uses side outputs; Spark's shape is ONE parsed/cached DataFrame and
  * N filtered projections — the parse cost is paid once (VERDICT round-1
  * guidance), and each split is a codegen'd filter. The `splits` function is
  * the library API; the query entries expose each split plus the exploded
  * display stream to the correctness gate. Conservation (rows_in ==
  * Σ splits) is locked by a ScalaTest property.
  */
object LogSplit extends OpModule {

  private val kSchema = StructType(Seq(StructField("k", LongType)))

  /** (table, type) -> sink_table routing config — single definition shared
    * by the batch router query and the streaming routed job.
    */
  val routingConfig: Seq[(String, String, String)] = Seq(
    ("order_info", "insert", "dwd_trade_order_add"),
    ("order_info", "update", "dwd_trade_order_upd"))

  /** Parse once, split five ways (page/start/err/display/action analog on
    * the events fixture: view/signup/error/purchase(displays)/click).
    * `extra` appends passthrough columns (e.g. `ts` for downstream DWS
    * event-time windows) without changing the x1 query contract.
    */
  def splits(events: DataFrame, extra: Seq[String] = Nil)
      : Map[String, DataFrame] = {
    val more = extra.map(col)
    val parsed = events
      .withColumn("parsed", from_json(col("props"), kSchema))
      .withColumn("k", col("parsed.k"))
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    Map(
      "page" -> parsed.filter(col("event_type") === "view")
        .select(col("event_id") +: col("user_id") +: col("k") +: more: _*),
      "start" -> parsed.filter(col("event_type") === "signup")
        .select(col("event_id") +: col("user_id") +: col("k") +: more: _*),
      "err" -> parsed.filter(col("event_type") === "error")
        .select(col("event_id") +: col("user_id") +: col("k") +: more: _*),
      // displays[] analog: k spawns (k % 3) + 1 display rows, exploded
      "display" -> parsed.filter(col("event_type") === "purchase")
        .select(col("event_id") +: col("user_id") +:
          explode(sequence(lit(1L), pmod(col("k"), lit(3L)) + 1L))
            .as("display_pos") +: more: _*),
      "action" -> parsed.filter(col("event_type") === "click")
        .select(col("event_id") +: col("user_id") +: col("k") +: more: _*))
  }

  def queries: Map[String, Q] = Map(
    "p2_log_etl" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          (col("event_type") === "view" || col("event_type") === "signup"))
        .select(col("event_id"), col("event_type"), col("user_id"))
    }),
    "x1_split_page" -> ((s, dir) => splits(t(s, dir, "events"))("page")),
    "x1_split_start" -> ((s, dir) => splits(t(s, dir, "events"))("start")),
    "x1_split_action" -> ((s, dir) => splits(t(s, dir, "events"))("action")),
    "x1_split_err" -> ((s, dir) => splits(t(s, dir, "events"))("err")),
    "x1_explode_display" -> ((s, dir) => splits(t(s, dir, "events"))("display")),
    "x2_fact_router" -> ((s, dir) => {
      import s.implicits._
      // (table, type) → sink_table config, broadcast-joined (J5/K2 shape)
      val config = routingConfig.toDF("cfg_table", "cfg_type", "sink_table")
      graft.functions.Cdc.envelopeFromOrders(t(s, dir, "orders"))
        .join(broadcast(config),
          col("tbl") === col("cfg_table") && col("type") === col("cfg_type"))
        .select(element_at(col("data"), "id").cast("bigint").as("id"),
          col("sink_table"))
    }))

  def oracles: Map[String, String] = Map(
    "p2_log_etl" ->
      """SELECT event_id, event_type, user_id FROM events
        |WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  AND event_type IN ('view', 'signup')""".stripMargin,
    "x1_split_page" ->
      """SELECT event_id, user_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  AND event_type = 'view'""".stripMargin,
    "x1_split_start" ->
      """SELECT event_id, user_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  AND event_type = 'signup'""".stripMargin,
    "x1_split_action" ->
      """SELECT event_id, user_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  AND event_type = 'click'""".stripMargin,
    "x1_split_err" ->
      """SELECT event_id, user_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  AND event_type = 'error'""".stripMargin,
    "x1_explode_display" ->
      """SELECT event_id, user_id, unnest(generate_series(1,
        |    (CAST(json_extract_string(props, '$.k') AS BIGINT) % 3) + 1))
        |    AS display_pos
        |FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  AND event_type = 'purchase'""".stripMargin,
    "x2_fact_router" ->
      """SELECT o_orderkey AS id, cfg.sink_table
        |FROM orders
        |JOIN (VALUES ('order_info','insert','dwd_trade_order_add'),
        |             ('order_info','update','dwd_trade_order_upd'))
        |  AS cfg(cfg_table, cfg_type, sink_table)
        |  ON cfg.cfg_type = (CASE WHEN o_orderkey % 10 = 0 THEN 'bootstrap-start'
        |                          WHEN o_orderstatus = 'O' THEN 'insert'
        |                          WHEN o_orderstatus = 'F' THEN 'update'
        |                          ELSE 'delete' END)""".stripMargin)
}
