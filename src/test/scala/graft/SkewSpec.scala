package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salting must change the shuffle layout, never the result. */
class SkewSpec extends SparkSpec {

  test("salted join is row-identical to the plain join") {
    val orders = graft.core.Tables.load(spark, sfDir, "orders")
      .withColumnRenamed("o_custkey", "custkey")
    val customer = graft.core.Tables.load(spark, sfDir, "customer")
      .withColumnRenamed("c_custkey", "custkey")
      .select(col("custkey"), col("c_name"))
    val plain = orders.join(customer, "custkey")
      .select(col("o_orderkey"), col("c_name"))
    val salted = Skew.saltedJoin(orders, customer, "custkey", 8)
      .select(col("o_orderkey"), col("c_name"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0 &&
      plain.exceptAll(salted).count() === 0)
  }

  test("salted count-distinct equals direct count-distinct") {
    val ev = graft.core.Tables.load(spark, sfDir, "events")
    val direct = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("distinct_ct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(ev, col("event_type"),
        col("user_id"), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === direct)
  }
}
