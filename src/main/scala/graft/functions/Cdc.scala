package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC-envelope helpers: the Maxwell/Debezium `{database, table, type, data,
  * old}` shape the reference consumes from `topic_db`
  * (ref: realtime-common/.../util/SQLUtil.java:25-37 declares it;
  * DimApp.java:181-201 and DwdBaseDb.java:171-183 parse+filter it).
  *
  * The fixtures have no CDC feed, so `envelopeFromOrders` synthesizes a
  * deterministic one from `orders` (status → op type, row → MAP payload) —
  * the operators downstream (filter, op-select, map-projection, pruning)
  * are then the real thing over real MapType columns.
  */
object Cdc {

  /** Deterministic CDC envelope rows from the orders table:
    * type: 'O'→insert, 'F'→update, 'P'→delete; every 10th key is a
    * bootstrap-start row (to exercise the ETL drop path).
    * `data` is the after-image, `old` the before-image (update/delete only).
    */
  def envelopeFromOrders(orders: DataFrame): DataFrame = {
    val typ = when(col("o_orderkey") % 10 === 0, lit("bootstrap-start"))
      .when(col("o_orderstatus") === "O", lit("insert"))
      .when(col("o_orderstatus") === "F", lit("update"))
      .otherwise(lit("delete"))
    val dataMap = map(
      lit("id"), col("o_orderkey").cast("string"),
      lit("user_id"), col("o_custkey").cast("string"),
      lit("status"), col("o_orderstatus"),
      lit("total_amount"), col("o_totalprice").cast("string"),
      lit("priority"), col("o_orderpriority"))
    val oldMap = when(typ.isin("update", "delete"),
      map(lit("id"), col("o_orderkey").cast("string"),
        lit("total_amount"), (col("o_totalprice") * 0.5).cast("string")))
    orders.select(
      lit("gmall").as("database"),
      lit("order_info").as("tbl"),
      typ.as("type"),
      dataMap.as("data"),
      oldMap.as("old"),
      (unix_timestamp(col("o_orderdate"))).as("ts"))
  }

  /** P1 ETL (ref DimApp.java:181-201): keep gmall rows, drop bootstrap
    * control rows, require a payload.
    */
  def etlFilter(df: DataFrame): DataFrame =
    df.filter(col("database") === "gmall" &&
      !col("type").isin("bootstrap-start", "bootstrap-complete") &&
      col("data").isNotNull && size(map_keys(col("data"))) > 0)

  /** P6 op-selector (ref DimApp.java:112-178, DwdBaseDb.java:147-169):
    * delete takes the before-image, everything else the after-image.
    */
  def opSelect(typ: Column, before: Column, after: Column): Column =
    when(typ === "delete", before).otherwise(after)

  /** P4/P5 config-driven column pruning (ref DimApp.java:87-104,
    * DwdBaseDb.java:84-98): keep only the keys listed in the CSV config
    * string — schema-as-data, no redeploy to change it.
    */
  def pruneColumns(data: Column, sinkColumnsCsv: Column): Column =
    map_filter(data, (k, _) => array_contains(split(sinkColumnsCsv, ","), k))
}
