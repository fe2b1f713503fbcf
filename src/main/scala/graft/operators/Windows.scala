package graft.operators

import org.apache.spark.sql.functions._

/** Tumbling-window aggregates — the DWS layer of the reference re-expressed
  * as declarative window aggregations over the `events` fixture.
  *
  * A1/W3: SQL 10s tumble COUNT
  *   (ref DwsTrafficSourceKeywordPageViewWindow.java:61-72)
  * A2/W1: keyed window reduce of several metrics
  *   (ref DwsTrafficVcChArIsNewPageViewWindow.java:70-108)
  * A3/W2: non-keyed (windowAll) tumble
  *   (ref DwsTrafficHomeDetailPageViewWindow.java:71-95)
  *
  * Scale notes: `groupBy(window(..), keys)` compiles to partial hash-agg →
  * shuffle on (window, keys) → final hash-agg; map-side combine makes the
  * shuffle carry one row per (window × key) per task, not per event. Flink's
  * windowAll is parallelism-1; Spark's keyless window agg still computes
  * partials in parallel — strictly better at 100 TB.
  */
object Windows extends OpModule {

  private val stt = date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt")
  private val edt = date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt")

  // DuckDB analog of window($"ts","10 seconds") bounds, epoch-aligned.
  private def bucket(expr: String, off: Int) =
    s"strftime(to_timestamp(floor(epoch(ts)/10)*10 + $off), '%Y-%m-%d %H:%M:%S') AS $expr"

  def queries: Map[String, Q] = Map(
    "a1_tumble_count" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("event_type") === "view")
        .groupBy(window(col("ts"), "10 seconds"))
        .agg(count(lit(1)).as("view_count"))
        .select(stt, edt, col("view_count"))
    }),
    // SLIDING window — the W-family member the tumble/session ops don't
    // cover: "active users over the last hour, refreshed every 15 min".
    // Spark's native window(ts, 1h, 15m) assigns each event its 4
    // overlapping epoch-aligned windows inside the scan's Generate (no
    // self-join); the distinct-user count is exact (a 2-shuffle
    // count_distinct — the HLL twin approx_uv_hll is the 100 TB
    // cardinality path, same as for A4).
    "a1_slide_uu" -> ((s, dir) =>
      t(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(countDistinct(col("user_id")).as("uu"),
          count(lit(1)).as("events"))
        .select(stt, edt, col("uu"), col("events"))),
    "a2_keyed_window_reduce" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .groupBy(window(col("ts"), "10 seconds"),
          col("event_type"), pmod(col("user_id"), lit(4)).as("ch"))
        .agg(count(lit(1)).as("pv_ct"),
          sum(col("value").cast("decimal(18,2)")).cast("string").as("val_sum"))
        .select(stt, edt, col("event_type"), col("ch"), col("pv_ct"), col("val_sum"))
    }),
    // beyond the reference: event-time sessionization (session_window is
    // native — state is one [start, last+gap) interval per open session)
    "a6_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("events_in_session"))
        .select(
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
          col("user_id"), col("events_in_session"))
    }),
    // session stats — the CONSUMER of sessionization: per user, how many
    // 30-min-gap sessions, how many events, and how long the sessions
    // ran. Spans are exact integer micros summed per user (exact), with
    // ONE IEEE division for the mean — bit-exact oracle. The oracle
    // re-derives session assignment relationally (gap >= 30 min starts a
    // session, matching session_window's half-open [t, t+gap) semantics).
    "a6_session_stats" -> ((s, dir) => {
      val sess = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_ev"),
          min(epochMicros(col("ts"))).as("t0"),
          max(epochMicros(col("ts"))).as("t1"))
      sess.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_ev")).as("n_events"),
          sum(col("t1") - col("t0")).as("total_span_us"))
        .withColumn("mean_span_us",
          col("total_span_us").cast("double") /
            col("n_sessions").cast("double"))
    }),
    "a3_global_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "10 seconds"))
        .agg(
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("view_ct"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("click_ct"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchase_ct"),
          sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("signup_ct"))
        .select(stt, edt, col("view_ct"), col("click_ct"),
          col("purchase_ct"), col("signup_ct"))
    }))

  def oracles: Map[String, String] = Map(
    "a6_session_stats" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events
        |           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |x AS (SELECT user_id, us,
        |        CASE WHEN lag(us) OVER w IS NULL
        |               OR us - lag(us) OVER w >= 1800000000
        |             THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |y AS (SELECT user_id, us,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM x),
        |s AS (SELECT user_id, sid, count(*) AS n_ev,
        |        min(us) AS t0, max(us) AS t1
        |      FROM y GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(n_ev) AS BIGINT) AS n_events,
        |  CAST(sum(t1 - t0) AS BIGINT) AS total_span_us,
        |  CAST(CAST(sum(t1 - t0) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS mean_span_us
        |FROM s GROUP BY 1""".stripMargin,
    "a1_tumble_count" ->
      s"""SELECT ${bucket("stt", 0)}, ${bucket("edt", 10)}, count(*) AS view_count
         |FROM events WHERE user_id IS NOT NULL AND event_type = 'view'
         |GROUP BY 1, 2""".stripMargin,
    // each event expands to its 4 overlapping 1 h / 15 min-slide windows
    // (start = floor(epoch/900)·900 − 900k, k = 0..3 — always exactly 4)
    "a1_slide_uu" ->
      """SELECT
        |  strftime(to_timestamp(floor(epoch(ts)/900)*900 - 900*k),
        |    '%Y-%m-%d %H:%M:%S') AS stt,
        |  strftime(to_timestamp(floor(epoch(ts)/900)*900 - 900*k + 3600),
        |    '%Y-%m-%d %H:%M:%S') AS edt,
        |  count(DISTINCT user_id) AS uu,
        |  CAST(count(*) AS BIGINT) AS events
        |FROM events, (SELECT unnest(generate_series(0, 3)) AS k) ks
        |WHERE user_id IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    "a2_keyed_window_reduce" ->
      s"""SELECT ${bucket("stt", 0)}, ${bucket("edt", 10)}, event_type,
         |  user_id % 4 AS ch, count(*) AS pv_ct,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS val_sum
         |FROM events WHERE user_id IS NOT NULL
         |GROUP BY 1, 2, 3, 4""".stripMargin,
    "a6_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    -- >= : Spark's session is [start, last+gap); an event at
        |    -- exactly last+gap falls outside and opens a new session
        |    CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |           OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM events WHERE user_id IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS stt,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS edt,
        |  user_id, count(*) AS events_in_session
        |FROM sess GROUP BY user_id, sid""".stripMargin,
    "a3_global_window" ->
      s"""SELECT ${bucket("stt", 0)}, ${bucket("edt", 10)},
         |  CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view_ct,
         |  CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click_ct,
         |  CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_ct,
         |  CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup_ct
         |FROM events GROUP BY 1, 2""".stripMargin)
}
