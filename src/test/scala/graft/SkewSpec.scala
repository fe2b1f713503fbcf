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

  test("auto-salting triggers on a hot key, stays plain when uniform") {
    import spark.implicits._
    // 50%-hot-key power law vs uniform keys, same schema
    val hot = spark.range(20000).select(
      when(col("id") % 2 === 0, 0L).otherwise(pmod(col("id"), lit(100)))
        .as("k"), col("id").as("payload"))
    val uniform = spark.range(20000).select(
      pmod(col("id"), lit(100)).as("k"), col("id").as("payload"))
    val dim = spark.range(100).select(col("id").as("k"),
      (col("id") * 3).as("dim_val"))

    assert(Skew.hotKeyShare(hot, "k", 0.5) > 0.4)
    assert(Skew.hotKeyShare(uniform, "k", 0.5) < 0.05)

    val auto = Skew.autoSaltedJoin(hot, dim, "k", buckets = 8)
    assert(auto.queryExecution.analyzed.toString.contains("__salt"),
      "hot input must take the salted path")
    val plainAuto = Skew.autoSaltedJoin(uniform, dim, "k", buckets = 8)
    assert(!plainAuto.queryExecution.analyzed.toString.contains("__salt"),
      "uniform input must take the plain path")

    // both paths result-identical to the reference join
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("payload"), col("dim_val"))
    val refHot = canon(hot.join(dim, "k"))
    assert(canon(auto).exceptAll(refHot).count() === 0 &&
      refHot.exceptAll(canon(auto)).count() === 0)
    val refUni = canon(uniform.join(dim, "k"))
    assert(canon(plainAuto).exceptAll(refUni).count() === 0 &&
      refUni.exceptAll(canon(plainAuto)).count() === 0)
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
