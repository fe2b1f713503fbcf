package graft.operators

import org.apache.spark.sql.functions._
import graft.streaming.StateMachines

/** Stateful per-key operators (batch execution of the shared state
  * machines; streaming twins live in graft.streaming.StatefulStreaming).
  *
  * A4 distinct-per-day dedup + 7-day returning rule
  *   (ref DwsUserUserLoginWindow.java:95-135)
  * A5 is_new repair state machine (ref DwdBaseLog.java:154-198)
  *
  * Scale notes: groupByKey(user_id) is one shuffle; per-group work is O(rows
  * in group) after an in-group sort by (ts, event_id) — the arrival-order
  * discipline SURVEY §7.4.3 calls out. State per key is a single long. The
  * exact dedup here is oracle-parity; the 100 TB cardinality path is
  * `approx_uv_hll` (approx_count_distinct), which needs no per-key state at
  * all.
  */
case class Ev(event_id: Long, user_id: Long, tsMillis: Long)

object Stateful extends OpModule {

  def queries: Map[String, Q] = Map(
    "a4_uv_per_day" -> ((s, dir) => {
      import s.implicits._
      val firsts = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("event_id"), col("user_id"),
          (unix_timestamp(col("ts")) * 1000).as("tsMillis"))
        .as[Ev]
        .groupByKey(_.user_id)
        .flatMapGroups { (uid: Long, it: Iterator[Ev]) =>
          var state = StateMachines.NoState
          it.toSeq.sortBy(e => (e.tsMillis, e.event_id)).flatMap { e =>
            val (ns, first, _) =
              StateMachines.dedupStep(state, StateMachines.epochDay(e.tsMillis))
            state = ns
            if (first) Some((StateMachines.dayString(StateMachines.epochDay(e.tsMillis)), uid))
            else None
          }
        }.toDF("cur_date", "user_id")
      firsts.groupBy(col("cur_date")).agg(count(lit(1)).as("uv_ct"))
    }),
    "a4_login_uu_window" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("event_id"), col("user_id"),
          (unix_timestamp(col("ts")) * 1000).as("tsMillis"))
        .as[Ev]
        .groupByKey(_.user_id)
        .flatMapGroups { (uid: Long, it: Iterator[Ev]) =>
          var state = StateMachines.NoState
          it.toSeq.sortBy(e => (e.tsMillis, e.event_id)).flatMap { e =>
            val day = StateMachines.epochDay(e.tsMillis)
            val (ns, first, back) = StateMachines.dedupStep(state, day)
            state = ns
            if (first) Some((StateMachines.dayString(day), if (back) 1L else 0L))
            else None
          }
        }.toDF("cur_date", "back")
        .groupBy(col("cur_date"))
        .agg(count(lit(1)).as("uu_ct"), sum(col("back")).as("back_ct"))
    }),
    "a5_is_new_repair" -> ((s, dir) => {
      import s.implicits._
      // is_new claim: signup events claim 1, everything else 0
      t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("event_id"), col("user_id"),
          (unix_timestamp(col("ts")) * 1000).as("tsMillis"),
          when(col("event_type") === "signup", 1).otherwise(0).as("claimed"))
        .as[(Long, Long, Long, Int)]
        .groupByKey(_._2)
        .flatMapGroups { (_: Long, it: Iterator[(Long, Long, Long, Int)]) =>
          var state = StateMachines.NoState
          it.toSeq.sortBy(e => (e._3, e._1)).map { case (eid, _, ts, claimed) =>
            val (ns, fixed) =
              StateMachines.isNewStep(state, claimed == 1, StateMachines.epochDay(ts))
            state = ns
            (eid, claimed, fixed)
          }
        }.toDF("event_id", "is_new_claimed", "is_new")
    }),
    // 100 TB path: HLL sketch instead of exact per-key state. The output
    // is deterministic-checkable without faking exactness: the query
    // computes BOTH the sketch and the exact count and emits a within_tol
    // verdict (|approx-exact|/exact <= 0.05); the oracle recomputes the
    // exact side and expects within_tol = true. At scale only the
    // approx_count_distinct branch runs — the exact twin here is the
    // verification harness, not the production plan.
    "approx_uv_hll" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("cur_date"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_uv"),
          count_distinct(col("user_id")).as("exact_uv"))
        .select(col("cur_date"), col("exact_uv"),
          (abs(col("approx_uv") - col("exact_uv")).cast("double") /
            col("exact_uv") <= 0.05).as("within_tol"))
    }))

  def oracles: Map[String, String] = Map(
    "a4_uv_per_day" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS cur_date,
        |  count(DISTINCT user_id) AS uv_ct
        |FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "a4_login_uu_window" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |lagged AS (SELECT user_id, d,
        |             lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev
        |           FROM ud)
        |SELECT strftime(d, '%Y-%m-%d') AS cur_date, count(*) AS uu_ct,
        |  CAST(sum(CASE WHEN prev IS NOT NULL AND d - prev > 7
        |                THEN 1 ELSE 0 END) AS BIGINT) AS back_ct
        |FROM lagged GROUP BY 1""".stripMargin,
    "a5_is_new_repair" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS is_new_claimed,
        |  CASE WHEN event_type = 'signup' AND first_claimed = 1
        |            AND CAST(ts AS DATE) = first_d
        |       THEN 1 ELSE 0 END AS is_new
        |FROM (SELECT *,
        |        first_value(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |          OVER w AS first_claimed,
        |        first_value(CAST(ts AS DATE)) OVER w AS first_d
        |      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))""".stripMargin,
    // the estimate itself is approximate by design; what IS deterministic
    // is the exact count and the 5%-tolerance verdict computed in-query
    "approx_uv_hll" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS cur_date,
        |  count(DISTINCT user_id) AS exact_uv, true AS within_tol
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1""".stripMargin)
}
