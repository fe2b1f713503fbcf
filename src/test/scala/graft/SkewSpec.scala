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

  test("SkewProbe adapts across batches with zero extra jobs") {
    // same hot/uniform shapes as the auto-salting test
    val hot = spark.range(20000).select(
      when(col("id") % 2 === 0, 0L).otherwise(pmod(col("id"), lit(100)))
        .as("k"), col("id").as("payload"))
    val uniform = spark.range(20000).select(
      pmod(col("id"), lit(100)).as("k"), col("id").as("payload"))
    val dim = spark.range(100).select(col("id").as("k"),
      (col("id") * 3).as("dim_val"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("payload"), col("dim_val"))

    val probe = new Skew.SkewProbe("k", buckets = 8)
    // job accounting: the observe-based probe must add NOTHING to the
    // batch's own action, while autoSaltedJoin's sampled probe is a
    // separate blocking job every call
    def countJobs(group: String)(action: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try action finally spark.sparkContext.clearJobGroup()
      // the status store is fed asynchronously; settle until stable
      var jobs = 0
      (1 to 100).takeWhile { _ =>
        val now = spark.sparkContext.statusTracker
          .getJobIdsForGroup(group).length
        val changed = now != jobs || now == 0
        jobs = now; Thread.sleep(30); changed
      }
      jobs
    }
    val jPlain = countJobs("skew_plain") {
      hot.join(dim, hot("k") === dim("k")).count(); () }
    // batch 1 (cold start): plain plan, probe rides the action via observe
    val b1 = probe.join(hot, dim)
    assert(!b1.queryExecution.analyzed.toString.contains("__salt"),
      "cold start takes the plain plan")
    val j1 = countJobs("skew_probe") { b1.count(); () }
    probe.refresh()
    assert(j1 === jPlain,
      s"probe must add no job beyond the plain join's own ($j1 vs $jPlain)")
    val jAuto = countJobs("skew_auto") {
      Skew.autoSaltedJoin(hot, dim, "k", buckets = 8).count(); () }
    assert(jAuto > jPlain,
      s"the sampled probe pays extra jobs ($jAuto vs $jPlain) — " +
        "exactly what SkewProbe deletes")
    assert(probe.share > 0.4, s"hot share learned from batch 1: ${probe.share}")

    // batch 2: the learned share salts the plan; result still identical
    val b2 = probe.join(hot, dim)
    assert(b2.queryExecution.analyzed.toString.contains("__salt"),
      "batch 2 must take the salted plan learned from batch 1")
    val refHot = canon(hot.join(dim, "k"))
    assert(canon(b2).exceptAll(refHot).count() === 0 &&
      refHot.exceptAll(canon(b2)).count() === 0)
    probe.refresh()

    // batch 3 goes uniform: share decays, batch 4 is plain again
    val b3 = probe.join(uniform, dim)
    b3.count()
    probe.refresh()
    assert(probe.share < 0.05, s"uniform share: ${probe.share}")
    assert(!probe.join(uniform, dim).queryExecution.analyzed.toString
      .contains("__salt"), "probe must fall back to the plain plan")
  }

  test("skew report: percentiles and hot ratio match a driver recompute") {
    val rep = graft.SparkEntry.queries("q_skew_report")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    assert(rep.keySet === Set("lineitem", "events"))
    val counts = graft.core.Tables.load(spark, sfDir, "events")
      .groupBy(col("user_id")).count()
      .collect().map(_.getLong(1)).sorted
    val (nRows, nKeys, mx, p50, p90, p99, ratio) = rep("events")
    assert(nKeys === counts.length.toLong)
    assert(nRows === counts.sum)
    assert(mx === counts.last)
    def pct(q: Int) = counts((nKeys * q + 99).toInt / 100 - 1)
    assert((p50, p90, p99) === ((pct(50), pct(90), pct(99))),
      "ceil-rank percentile over the sorted per-key counts")
    assert(ratio === mx * nKeys * 1000000L / nRows)
    assert(ratio >= 1000000L, "max/mean is at least 1 by definition")
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
