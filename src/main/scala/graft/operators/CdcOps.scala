package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Cdc

/** CDC-envelope operators (the topic_db path of the reference) plus the
  * scalar-function suite.
  *
  * P1 ETL parse+filter        (ref DimApp.java:181-201)
  * P3 parse-or-drop           (ref DwdBaseDb.java:171-183)
  * P6 op-selector             (ref DimApp.java:112-178)
  * P7 map projection          (ref DwdTradeCartAdd.java:58-77)
  * P8 predicate filters       (ref DwdTradeCartAdd.java:72-77)
  * P9 cart-add delta          (ref DwdTradeCartAdd.java:64)
  * P10 snake_case JSON        (ref DorisMapFunction.java:14-21)
  * S3 JSON source w/ schema   (ref SQLUtil.java:14-37)
  * F1-F9 scalar functions     (ref SURVEY §2.8)
  *
  * The CDC envelope is synthesized deterministically from `orders`
  * (Cdc.envelopeFromOrders) so the MapType/from_json operators are real and
  * the DuckDB oracle can mirror semantics from the base table. All map
  * access / conditionals / casts are Catalyst built-ins — whole-stage
  * codegen, no UDFs.
  */
object CdcOps extends OpModule {

  // oracle-side fragments mirroring Cdc.envelopeFromOrders
  private val oraType =
    """CASE WHEN o_orderkey % 10 = 0 THEN 'bootstrap-start'
      |     WHEN o_orderstatus = 'O' THEN 'insert'
      |     WHEN o_orderstatus = 'F' THEN 'update'
      |     ELSE 'delete' END""".stripMargin

  def queries: Map[String, Q] = Map(
    "s3_json_source" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("parsed",
          from_json(col("props"), StructType(Seq(StructField("k", LongType)))))
        .select(col("event_id"), col("parsed.k").as("k"))
    }),
    "p1_cdc_etl" -> ((s, dir) => {
      Cdc.etlFilter(Cdc.envelopeFromOrders(t(s, dir, "orders")))
        .select(element_at(col("data"), "id").cast("bigint").as("id"),
          col("type"))
    }),
    "p3_parse_or_drop" -> ((s, dir) => {
      // every 7th payload corrupted → from_json yields null → dropped
      t(s, dir, "events")
        .withColumn("raw",
          when(col("event_id") % 7 === 0, expr("substring(props, 1, 3)"))
            .otherwise(col("props")))
        .withColumn("parsed",
          from_json(col("raw"), StructType(Seq(StructField("k", LongType)))))
        .filter(col("parsed").isNotNull && col("parsed.k").isNotNull)
        .select(col("event_id"), col("parsed.k").as("k"))
    }),
    "p4_config_pruning" -> ((s, dir) => {
      import s.implicits._
      // schema-as-data: the kept column set comes from a config row
      // (broadcast-joined), applied with map_filter — changing the config
      // reshapes the output without redeploy (ref DimApp.java:87-104)
      val config = Seq(
        ("order_info", "insert", "id,user_id,total_amount"),
        ("order_info", "update", "id,status"),
        ("order_info", "delete", "id"))
        .toDF("cfg_table", "cfg_type", "sink_columns")
      Cdc.envelopeFromOrders(t(s, dir, "orders"))
        .join(broadcast(config),
          col("tbl") === col("cfg_table") && col("type") === col("cfg_type"))
        .withColumn("pruned", Cdc.pruneColumns(col("data"), col("sink_columns")))
        .select(
          element_at(col("pruned"), "id").cast("bigint").as("id"),
          col("type"),
          element_at(col("pruned"), "user_id").cast("bigint").as("user_id"),
          element_at(col("pruned"), "status").as("status"),
          element_at(col("pruned"), "total_amount").cast("decimal(18,2)")
            .cast("string").as("total_amount"))
    }),
    "p6_op_selector" -> ((s, dir) => {
      val env = Cdc.etlFilter(Cdc.envelopeFromOrders(t(s, dir, "orders")))
      env.withColumn("img", Cdc.opSelect(col("type"), col("old"), col("data")))
        .select(element_at(col("img"), "id").cast("bigint").as("id"),
          col("type"),
          element_at(col("img"), "total_amount").cast("decimal(18,2)")
            .cast("string").as("amount"))
    }),
    "p7_map_projection" -> ((s, dir) => {
      Cdc.envelopeFromOrders(t(s, dir, "orders"))
        .select(
          element_at(col("data"), "id").cast("bigint").as("id"),
          element_at(col("data"), "user_id").cast("bigint").as("user_id"),
          element_at(col("data"), "status").as("status"),
          element_at(col("data"), "total_amount").cast("decimal(18,2)")
            .cast("string").as("total_amount"))
    }),
    "p8_predicate_filter" -> ((s, dir) => {
      Cdc.envelopeFromOrders(t(s, dir, "orders"))
        .filter(col("type") === "insert" ||
          (col("type") === "update" &&
            element_at(col("old"), "total_amount").isNotNull &&
            element_at(col("data"), "total_amount").cast("double") >
              element_at(col("old"), "total_amount").cast("double")))
        .select(element_at(col("data"), "id").cast("bigint").as("id"),
          col("type"))
    }),
    "p9_cart_delta" -> ((s, dir) => {
      Cdc.envelopeFromOrders(t(s, dir, "orders"))
        .filter(col("type").isin("insert", "update"))
        .select(
          element_at(col("data"), "id").cast("bigint").as("id"),
          when(col("type") === "insert",
            element_at(col("data"), "total_amount").cast("decimal(18,2)"))
            .otherwise(
              element_at(col("data"), "total_amount").cast("decimal(18,2)") -
              element_at(col("old"), "total_amount").cast("decimal(18,2)"))
            .cast("string").as("delta"))
    }),
    "p10_snakecase_json" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_orderkey").as("order_id"),
        to_json(struct(col("o_orderkey").as("order_id"),
          col("o_orderstatus").as("order_status"),
          col("o_orderpriority").as("order_priority"))).as("payload"))
    }),
    "f_scalar_suite" -> ((s, dir) => {
      t(s, dir, "events").select(
        col("event_id"),
        col("event_id").cast("string").as("id_str"),                    // F1
        col("value").cast("bigint").as("value_int"),                    // F1
        when(col("event_type") === "error", lit("bad"))
          .otherwise(lit("ok")).as("flag"),                             // F2
        element_at(map(lit("t"), col("event_type")), "t").as("m_get"),  // F3
        (col("user_id").isNotNull && col("value") > 50.0).as("pred"),   // F4
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_sec"),     // F5
        date_format(col("ts"), "yyyy-MM-dd").as("dt"),                  // F6
        date_format(col("ts"), "yyyyMMdd").as("dt_part"),               // F6
        (unix_timestamp(col("ts")) * 1000).as("epoch_ms"),              // F6
        get_json_object(col("props"), "$.k").cast("bigint").as("k"),    // F7
        split(lit("a,b,c"), ",").getItem(1).as("csv_second"))           // F9
    }))

  def oracles: Map[String, String] = Map(
    "s3_json_source" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,
    "p1_cdc_etl" ->
      s"""SELECT o_orderkey AS id, $oraType AS type
         |FROM orders WHERE o_orderkey % 10 <> 0""".stripMargin,
    "p3_parse_or_drop" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE event_id % 7 <> 0""".stripMargin,
    "p4_config_pruning" ->
      s"""SELECT o_orderkey AS id, $oraType AS type,
         |  CASE WHEN o_orderstatus = 'O' THEN o_custkey END AS user_id,
         |  CASE WHEN o_orderstatus = 'F' THEN o_orderstatus END AS status,
         |  CAST(CASE WHEN o_orderstatus = 'O'
         |       THEN CAST(o_totalprice AS DECIMAL(18,2)) END AS VARCHAR) AS total_amount
         |FROM orders WHERE o_orderkey % 10 <> 0""".stripMargin,
    "p6_op_selector" ->
      s"""SELECT o_orderkey AS id, $oraType AS type,
         |  CAST(CAST(CAST(CASE WHEN o_orderstatus NOT IN ('O','F') THEN o_totalprice * 0.5
         |            ELSE o_totalprice END AS VARCHAR) AS DECIMAL(18,2)) AS VARCHAR) AS amount
         |FROM orders WHERE o_orderkey % 10 <> 0""".stripMargin,
    "p7_map_projection" ->
      s"""SELECT o_orderkey AS id, o_custkey AS user_id, o_orderstatus AS status,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS total_amount
         |FROM orders""".stripMargin,
    "p8_predicate_filter" ->
      s"""SELECT o_orderkey AS id, $oraType AS type
         |FROM orders
         |WHERE o_orderkey % 10 <> 0
         |  AND (o_orderstatus = 'O'
         |       OR (o_orderstatus = 'F' AND o_totalprice > o_totalprice * 0.5))""".stripMargin,
    "p9_cart_delta" ->
      s"""SELECT o_orderkey AS id,
         |  CAST(CASE WHEN o_orderstatus = 'O'
         |       THEN CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(18,2))
         |       ELSE CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(18,2))
         |            - CAST(CAST(o_totalprice * 0.5 AS VARCHAR) AS DECIMAL(18,2))
         |       END AS VARCHAR) AS delta
         |FROM orders WHERE o_orderkey % 10 <> 0 AND o_orderstatus IN ('O','F')""".stripMargin,
    "p10_snakecase_json" ->
      """SELECT o_orderkey AS order_id,
        |  CAST(to_json(struct_pack(order_id := o_orderkey,
        |    order_status := o_orderstatus,
        |    order_priority := o_orderpriority)) AS VARCHAR) AS payload
        |FROM orders""".stripMargin,
    "f_scalar_suite" ->
      """SELECT event_id,
        |  CAST(event_id AS VARCHAR) AS id_str,
        |  CAST(trunc(value) AS BIGINT) AS value_int,
        |  CASE WHEN event_type = 'error' THEN 'bad' ELSE 'ok' END AS flag,
        |  event_type AS m_get,
        |  (user_id IS NOT NULL AND value > 50.0) AS pred,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_sec,
        |  strftime(ts, '%Y-%m-%d') AS dt,
        |  strftime(ts, '%Y%m%d') AS dt_part,
        |  CAST(floor(epoch(ts)) AS BIGINT) * 1000 AS epoch_ms,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  'b' AS csv_second
        |FROM events""".stripMargin)
}
