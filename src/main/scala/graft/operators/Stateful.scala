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
    }),
    // event transition matrix (the Markov/path-analysis primitive): for
    // each user's event sequence ordered by (ts, event_id) — the same
    // deterministic total order the A4/A5 state machines use — count
    // every consecutive (from_type → to_type) step across the corpus.
    // The window is PARTITIONED by user (bounded per-key work, the
    // legitimate windowed shape — never a global order), and only
    // (from, to) pairs reach the counting aggregate.
    "a9_event_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("steps"))
    }),
    // cohort retention (the signup-cohort × day-offset matrix): users
    // grouped by their FIRST signup date; for each later active day, how
    // many of that cohort were active day_offset days in. All date
    // arithmetic is exact integer days on DATE values (datediff ≡
    // date_diff('day')), so the matrix is bit-exact cross-engine. Shape:
    // one barriered thin (user_id, date) pass; cohort anchors are a tiny
    // per-user min; (user, day) is distinct before the join so each user
    // contributes at most one row per cell — count(*), no count_distinct
    // shuffle expansion.
    "a8_cohort_retention" -> ((s, dir) => {
      import graft.core.Barrier.BarrierOps
      val ev = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("d"),
          col("event_type"))
        .barrier() // cohort anchors AND the activity relation read it
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("d")).as("c0"))
      val act = ev.select(col("user_id"), col("d")).distinct()
      act.join(cohort, "user_id")
        .filter(col("d") >= col("c0"))
        .groupBy(date_format(col("c0"), "yyyy-MM-dd").as("cohort_date"),
          datediff(col("d"), col("c0")).cast("long").as("day_offset"))
        .agg(count(lit(1)).as("users"))
    }),
    // conversion funnel (the CEP-flavored user-journey op): how many
    // users reach view, then click within 24 h STRICTLY AFTER their first
    // view, then purchase within 24 h after that click — each stage
    // anchored at the user's EARLIEST qualifying event, so a click that
    // precedes every view does not convert and a late one misses the
    // deadline. Time arithmetic is exact integer MICROSECONDS
    // (unix_micros ≡ DuckDB epoch_us), so the deadline boundary is
    // bit-exact cross-engine. Three thin per-user min-aggregates chained
    // by (user_id) joins over ONE barriered (user_id, type, us) pass of
    // events — no sorting, no per-user state, no window over all events.
    "a7_funnel_steps" -> ((s, dir) => {
      import graft.core.Barrier.BarrierOps
      val day = 86400000000L // 24 h in microseconds
      val ev = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("event_type"),
          epochMicros(col("ts")).as("us"))
        .barrier() // three stage filters read it
      // each stage is read twice (the next stage's join + its own count)
      // — barrier the thin (user_id, t) relations so neither re-derives
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1")).barrier()
      val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
        .filter(col("us") > col("t1") && col("us") <= col("t1") + day)
        .groupBy(col("user_id")).agg(min(col("us")).as("t2")).barrier()
      val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
        .filter(col("us") > col("t2") && col("us") <= col("t2") + day)
        .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
      // stage literal as BIGINT on both sides (OpModule output discipline:
      // the gate hash is integer-width-sensitive)
      s1.agg(count(lit(1)).as("users"))
        .select(lit(1L).as("stage"), lit("view").as("event_type"),
          col("users"))
        .unionByName(s2.agg(count(lit(1)).as("users"))
          .select(lit(2L).as("stage"), lit("click").as("event_type"),
            col("users")))
        .unionByName(s3.agg(count(lit(1)).as("users"))
          .select(lit(3L).as("stage"), lit("purchase").as("event_type"),
            col("users")))
    }),
    // Funnel conversion-latency quantiles — the depth behind
    // a7_funnel_steps' counts: exact p50/p95 of view→click and
    // click→purchase latency (integer microseconds, exactly representable
    // as doubles) via the histogram RANK-SELECTION core shared with
    // q_quantiles_approx (Relational.exactQuantileSelect) — the k-th
    // smallest VALUE, tie-order independent, so the oracle's sort-derived
    // selection matches bit-for-bit. Each stage keeps its anchor time in
    // the groupBy key (t1/t2 are functions of user_id), so latencies fall
    // out of the stage aggregates with NO extra join; the quantile core
    // is a B-bucket histogram + one bucket-local rank — never a global
    // sort.
    "a7_funnel_latency" -> ((s, dir) => {
      import graft.core.Barrier.BarrierOps
      val day = 86400000000L
      val ev = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("event_type"),
          epochMicros(col("ts")).as("us"))
        .barrier()
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1")).barrier()
      val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
        .filter(col("us") > col("t1") && col("us") <= col("t1") + day)
        .groupBy(col("user_id"), col("t1")).agg(min(col("us")).as("t2"))
        .barrier() // read by its latency branch AND stage 3
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2.select(col("user_id"), col("t2")), "user_id")
        .filter(col("us") > col("t2") && col("us") <= col("t2") + day)
        .groupBy(col("user_id"), col("t2")).agg(min(col("us")).as("t3"))
      val lat = s2.select(lit("view_to_click").as("l_returnflag"),
          (col("t2") - col("t1")).cast("double").as("l_extendedprice"))
        .unionByName(s3.select(
          lit("click_to_purchase").as("l_returnflag"),
          (col("t3") - col("t2")).cast("double").as("l_extendedprice")))
        .barrier() // the quantile core reads it 3x (extents/counts/pick)
      val n = lat.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_users"))
      Relational.exactQuantileSelect(lat)
        .join(n, "l_returnflag")
        .select(col("l_returnflag").as("stage"), col("n_users"),
          col("p50x").as("p50_us"), col("p95x").as("p95_us"))
    }),
    // Windowed rate-anomaly detection — the ops-monitoring op: per
    // (event_type, 1 h epoch-aligned tumble) counts, flagged when a
    // window exceeds 2× that type's MEDIAN window count. The median is
    // rank-selected (k = ceil(n/2)-th smallest count, window-start
    // tie-break) over the (type, window) COUNT relation — which is
    // O(types × time-range), data-size independent, so the per-type rank
    // window is bounded at any corpus scale; raw events only ever feed
    // the first map-side-combinable count.
    "a10_rate_anomaly" -> ((s, dir) =>
      rateAnomalyFlag(rateAnomalyCounts(t(s, dir, "events")))))

  /** Per-(event_type, 1 h epoch-aligned tumble) counts over a raw-events
    * relation. ADDITIVE across disjoint event slices — a window's count
    * is the sum of its slices' counts — which is what lets the streaming
    * tier ([[graft.streaming.StatefulStreaming.rateAnomalyIngestBatch]])
    * maintain per-batch contributions and roll them up exactly. */
  private[graft] def rateAnomalyCounts(
      ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.filter(col("ts").isNotNull)
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"),
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"),
        col("cnt"))

  /** Median rank-selection + 2× flag over a (event_type, window_start,
    * cnt) relation — shared verbatim by the batch query and the
    * streaming store reader, so stream-maintained counts flag exactly
    * like the batch query. The rank window runs on the O(types ×
    * time-range) COUNT relation, bounded at any corpus scale. */
  private[graft] def rateAnomalyFlag(
      counts0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Barrier.BarrierOps
    val counts = counts0
      .barrier() // ranked for the median AND flagged in the output
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("cnt").asc, col("window_start").asc)
    val med = counts
      .withColumn("rn", row_number().over(wOrd))
      .join(counts.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nw")), "event_type")
      .filter(col("rn") === ceil(lit(0.5) * col("nw")).cast("long"))
      .select(col("event_type"), col("cnt").as("med"))
    counts.join(broadcast(med), "event_type")
      .select(col("event_type"), col("window_start"),
        col("cnt"), col("med"),
        (col("cnt") > lit(2) * col("med")).as("is_anomaly"))
  }

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
        |GROUP BY 1""".stripMargin,
    "a9_event_transitions" ->
      """SELECT from_type, event_type AS to_type, count(*) AS steps
        |FROM (SELECT event_type, lag(event_type) OVER (
        |        PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        |      FROM events
        |      WHERE user_id IS NOT NULL AND ts IS NOT NULL)
        |WHERE from_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    "a8_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d, event_type
        |           FROM events
        |           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |c AS (SELECT user_id, min(d) AS c0 FROM e
        |      WHERE event_type = 'signup' GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, d FROM e)
        |SELECT strftime(c0, '%Y-%m-%d') AS cohort_date,
        |  date_diff('day', c0, d) AS day_offset, count(*) AS users
        |FROM a JOIN c USING (user_id)
        |WHERE d >= c0 GROUP BY 1, 2""".stripMargin,
    "a7_funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |           FROM events
        |           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s1 AS (SELECT user_id, min(us) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.us) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.us > s1.t1
        |         AND e.us <= s1.t1 + 86400000000 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.us) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.us > s2.t2
        |         AND e.us <= s2.t2 + 86400000000 GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
        |  count(*) AS users FROM s1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'click', count(*) FROM s2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM s3""".stripMargin,
    // the same funnel ladder keeping each stage's anchor, then quantiles
    // by SORT-DERIVED rank selection — the k-th smallest VALUE is what
    // the Spark side's histogram rank-selection also returns
    "a7_funnel_latency" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |           FROM events
        |           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s1 AS (SELECT user_id, min(us) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, s1.t1, min(e.us) AS t2
        |       FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.us > s1.t1
        |         AND e.us <= s1.t1 + 86400000000 GROUP BY 1, 2),
        |s3 AS (SELECT e.user_id, s2.t2, min(e.us) AS t3
        |       FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.us > s2.t2
        |         AND e.us <= s2.t2 + 86400000000 GROUP BY 1, 2),
        |lat AS (
        |  SELECT 'view_to_click' AS stage, CAST(t2 - t1 AS DOUBLE) AS lat
        |  FROM s2
        |  UNION ALL
        |  SELECT 'click_to_purchase', CAST(t3 - t2 AS DOUBLE) FROM s3),
        |ranked AS (
        |  SELECT stage, lat,
        |    row_number() OVER (PARTITION BY stage ORDER BY lat) AS rn,
        |    count(*) OVER (PARTITION BY stage) AS n
        |  FROM lat)
        |SELECT stage, CAST(max(n) AS BIGINT) AS n_users,
        |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
        |      THEN lat END) AS p50_us,
        |  max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
        |      THEN lat END) AS p95_us
        |FROM ranked GROUP BY 1""".stripMargin,
    // epoch-aligned 1 h buckets (the a1 tumble idiom), per-type median
    // window count by rank selection, 2x flag
    "a10_rate_anomaly" ->
      """WITH c AS (
        |  SELECT event_type,
        |    strftime(to_timestamp(floor(epoch(ts)/3600)*3600),
        |             '%Y-%m-%d %H:%M:%S') AS window_start,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE ts IS NOT NULL
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, cnt,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cnt ASC, window_start ASC) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS nw
        |  FROM c),
        |m AS (SELECT event_type, cnt AS med FROM r
        |      WHERE rn = CAST(ceil(0.5 * nw) AS BIGINT))
        |SELECT c.event_type, c.window_start, c.cnt, m.med,
        |  c.cnt > 2 * m.med AS is_anomaly
        |FROM c JOIN m USING (event_type)""".stripMargin)
}
