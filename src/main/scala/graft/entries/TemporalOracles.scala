package graft.entries

/** Oracle SQL for the Temporal-module keys (sessions, as-of/range joins, event analytics) — split out of SparkEntry at r15 (one file
  * for 182 keys hit the same maintainability wall the Curation module
  * did). Entry text is UNCHANGED from SparkEntry; the exactness ground
  * rules live in [[graft.SparkEntry]]'s scaladoc and
  * [[OracleCtes]] holds the shared CTE fragments/constants.
  */
trait TemporalOracles {
  import OracleCtes._

  protected def temporalOracles: Map[String, String] = Map(

    "x86_event_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
        |        lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS nxt
        |      FROM events),
        |p AS (SELECT event_type AS from_type, nxt AS to_type FROM o WHERE nxt IS NOT NULL),
        |c AS (SELECT from_type, to_type, count(*)::BIGINT AS n_trans FROM p GROUP BY 1, 2),
        |m AS (SELECT from_type, sum(n_trans)::BIGINT AS n_from FROM c GROUP BY 1)
        |SELECT from_type, to_type, n_trans,
        |       n_trans::DOUBLE / n_from AS p_trans
        |FROM c JOIN m USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,


    "x88_journey_scores" ->
      """WITH o AS (SELECT user_id, event_type,
        |        lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS nxt
        |      FROM events),
        |p AS (SELECT user_id, event_type AS from_type, nxt AS to_type FROM o WHERE nxt IS NOT NULL),
        |c AS (SELECT from_type, to_type, count(*)::BIGINT AS n_trans FROM p GROUP BY 1, 2),
        |m AS (SELECT from_type, sum(n_trans)::BIGINT AS n_from FROM c GROUP BY 1),
        |j AS (SELECT user_id, n_trans, n_from, n_trans::DOUBLE / n_from AS pr
        |      FROM p JOIN c USING (from_type, to_type) JOIN m USING (from_type))
        |SELECT user_id, count(*)::BIGINT AS n_steps, min(pr) AS min_p,
        |       sum(n_trans)::DOUBLE / sum(n_from)::DOUBLE AS pooled_p
        |FROM j GROUP BY 1 ORDER BY user_id""".stripMargin,


    "x101_disorder_audit" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |w AS (SELECT event_type, ms,
        |        max(ms) OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) - ms AS lag_ms
        |      FROM e)
        |SELECT event_type, count(*)::BIGINT AS n_events,
        |       sum(CASE WHEN lag_ms = 0 THEN 1 ELSE 0 END)::BIGINT AS n_in_order,
        |       sum(CASE WHEN lag_ms > 0 AND lag_ms < 1000 THEN 1 ELSE 0 END)::BIGINT AS late_lt_1s,
        |       sum(CASE WHEN lag_ms >= 1000 AND lag_ms < 10000 THEN 1 ELSE 0 END)::BIGINT AS late_lt_10s,
        |       sum(CASE WHEN lag_ms >= 10000 AND lag_ms < 60000 THEN 1 ELSE 0 END)::BIGINT AS late_lt_60s,
        |       sum(CASE WHEN lag_ms >= 60000 THEN 1 ELSE 0 END)::BIGINT AS late_ge_60s,
        |       max(lag_ms)::BIGINT AS max_lag_ms,
        |       (count(*) - sum(CASE WHEN lag_ms = 0 THEN 1 ELSE 0 END))::DOUBLE / count(*) AS frac_late
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,


    "x110_burstiness" ->
      """WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events),
        |g AS (SELECT event_type,
        |        us - lag(us) OVER (PARTITION BY user_id, event_type ORDER BY us, event_id) AS gap_us
        |      FROM e),
        |a AS (SELECT event_type, count(*)::BIGINT AS n_gaps,
        |        sum(gap_us)::BIGINT AS sum_gap_us,
        |        sum(gap_us::HUGEINT * gap_us)::DECIMAL(38,0) AS sum_gap_sq
        |      FROM g WHERE gap_us IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_gaps, sum_gap_us,
        |       sum_gap_sq::VARCHAR AS sum_gap_sq,
        |       sum_gap_us::DOUBLE / n_gaps::DOUBLE AS mean_gap_us,
        |       CASE WHEN sum_gap_us = 0 THEN NULL
        |            ELSE (n_gaps::DOUBLE * sum_gap_sq::DOUBLE
        |                  - sum_gap_us::DOUBLE * sum_gap_us::DOUBLE)
        |                 / (sum_gap_us::DOUBLE * sum_gap_us::DOUBLE) END AS cv2
        |FROM a ORDER BY event_type""".stripMargin,


    "x26_sessionize" ->
      """WITH e AS (SELECT user_id, ts, epoch_us(ts) AS us FROM events),
        |w AS (SELECT user_id, ts,
        |        CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
        |             THEN 1 ELSE 0 END AS brk
        |      FROM e),
        |s AS (SELECT user_id, ts,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
        |      FROM w)
        |SELECT user_id, session_id::BIGINT AS session_id, min(ts) AS session_start,
        |       max(ts) AS session_end, count(*) AS n_events
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    "x27_asof_join" ->
      """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
        |     v AS (SELECT * FROM events WHERE event_type = 'view')
        |SELECT c.event_id, c.user_id, c.ts, v.event_id AS view_event_id, v.ts AS view_ts
        |FROM c ASOF JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,


    "x28_range_join" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS us FROM events)
        |SELECT a.event_id AS e1, b.event_id AS e2, (b.us - a.us) / 1000000.0 AS delta_s
        |FROM ev a JOIN ev b ON a.event_id < b.event_id AND abs(a.us - b.us) <= 5000000
        |ORDER BY e1, e2""".stripMargin,


    // x12's epoch-aligned window buckets + per-window top-k by (count
    // desc, user_id) — the row_number spelling of the bounded aggregate
    "x76_trending_keys" ->
      """WITH c AS (SELECT (floor(epoch(ts) / 600) * 600)::BIGINT AS window_start_s,
        |              user_id, count(*)::BIGINT AS n_events
        |       FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY window_start_s
        |                ORDER BY n_events DESC, user_id) AS rank FROM c)
        |SELECT window_start_s, rank, user_id, n_events FROM r WHERE rank <= 3
        |ORDER BY window_start_s, rank""".stripMargin,


    "x55_event_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t FROM ev WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.us) AS t FROM ev e JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.us > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.us) AS t FROM ev e JOIN s2 ON s2.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.us > s2.t GROUP BY 1)
        |SELECT 1::BIGINT AS step, 'view' AS step_name, count(*) AS n_users FROM s1
        |UNION ALL SELECT 2, 'click', count(*) FROM s2
        |UNION ALL SELECT 3, 'purchase', count(*) FROM s3
        |ORDER BY step""".stripMargin,


    "x56_retention_cohorts" ->
      """WITH ev AS (SELECT DISTINCT user_id,
        |              (epoch_us(ts) // 86400000000 + 3) // 7 AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1)
        |SELECT c.cohort_wk, ev.wk - c.cohort_wk AS week_offset, count(*) AS n_users
        |FROM ev JOIN c ON c.user_id = ev.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // dense hour grid (absent hours count 0), scaled-integer deviations
    // dev = H*c - T, cusum in hour order, peak tie to the earliest hour
    "x122_cusum_drift" ->
      """WITH ev AS (SELECT event_type,
        |                   (floor(epoch(ts) / 3600) * 3600)::BIGINT AS hour_s FROM events),
        |cells AS (SELECT event_type, hour_s, count(*)::BIGINT AS c FROM ev GROUP BY 1, 2),
        |span AS (SELECT min(hour_s) AS h0, max(hour_s) AS h1 FROM cells),
        |grid AS (SELECT unnest(range(h0, h1 + 3600, 3600)) AS hour_s FROM span),
        |types AS (SELECT DISTINCT event_type FROM cells),
        |dense AS (SELECT t.event_type, g.hour_s, coalesce(c.c, 0)::BIGINT AS c
        |          FROM types t CROSS JOIN grid g
        |          LEFT JOIN cells c ON c.event_type = t.event_type AND c.hour_s = g.hour_s),
        |st AS (SELECT event_type, hour_s, c,
        |              count(*) OVER (PARTITION BY event_type)::BIGINT AS n_hours,
        |              sum(c) OVER (PARTITION BY event_type)::BIGINT AS n_events
        |       FROM dense),
        |cu AS (SELECT event_type, hour_s, n_hours, n_events,
        |              sum(n_hours * c - n_events) OVER (PARTITION BY event_type ORDER BY hour_s
        |                ROWS UNBOUNDED PRECEDING)::BIGINT AS cusum
        |       FROM st),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |                 ORDER BY abs(cusum) DESC, hour_s) AS rn FROM cu)
        |SELECT event_type, n_hours, n_events, hour_s AS peak_hour_s,
        |       cusum AS peak_cusum, abs(cusum)::BIGINT AS peak_abs
        |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin,


    // dense grid (x122's spelling), lag self-join on the shifted hour,
    // exact BIGINT Pearson moments, ONE guarded double division
    "x135_periodicity" ->
      s"""WITH ev AS (SELECT event_type,
         |                  (floor(epoch(ts) / 3600) * 3600)::BIGINT AS hour_s FROM events),
         |cells AS (SELECT event_type, hour_s, count(*)::BIGINT AS c FROM ev GROUP BY 1, 2),
         |span AS (SELECT min(hour_s) AS h0, max(hour_s) AS h1 FROM cells),
         |grid AS (SELECT unnest(range(h0, h1 + 3600, 3600)) AS hour_s FROM span),
         |types AS (SELECT DISTINCT event_type FROM cells),
         |dense AS (SELECT t.event_type, g.hour_s, coalesce(c.c, 0)::BIGINT AS c
         |          FROM types t CROSS JOIN grid g
         |          LEFT JOIN cells c ON c.event_type = t.event_type AND c.hour_s = g.hour_s),
         |j AS (SELECT a.event_type, l.lag_hours::BIGINT AS lag_hours, a.c AS cx, b.c AS cy
         |      FROM dense a
         |      CROSS JOIN (SELECT unnest([${periodicityLags.mkString(", ")}]) AS lag_hours) l
         |      JOIN dense b ON b.event_type = a.event_type
         |                  AND b.hour_s = a.hour_s + l.lag_hours * 3600),
         |agg AS (SELECT event_type, lag_hours, count(*)::BIGINT AS n_terms,
         |               sum(cx)::BIGINT AS sx, sum(cy)::BIGINT AS sy,
         |               sum(cx * cx)::BIGINT AS sxx, sum(cy * cy)::BIGINT AS syy,
         |               sum(cx * cy)::BIGINT AS sxy
         |        FROM j GROUP BY 1, 2)
         |SELECT event_type, lag_hours, n_terms,
         |       (n_terms * sxy - sx * sy)::BIGINT AS num,
         |       (n_terms * sxx - sx * sx)::BIGINT AS var_x,
         |       (n_terms * syy - sy * sy)::BIGINT AS var_y,
         |       CASE WHEN n_terms * sxx - sx * sx = 0 OR n_terms * syy - sy * sy = 0 THEN NULL
         |            ELSE round((n_terms * sxy - sx * sy)::DOUBLE /
         |                       sqrt((n_terms * sxx - sx * sx)::DOUBLE * (n_terms * syy - sy * sy)::DOUBLE), 4)
         |       END AS corr4
         |FROM agg ORDER BY event_type, lag_hours""".stripMargin,


    // x110's moment spelling per 10-minute window (the x12 epoch-second
    // window convention); gaps never cross a window boundary
    "x137_windowed_burstiness" ->
      """WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
        |                  (floor(epoch(ts) / 600) * 600)::BIGINT AS window_start_s FROM events),
        |g AS (SELECT window_start_s, event_type,
        |        us - lag(us) OVER (PARTITION BY window_start_s, user_id, event_type
        |                           ORDER BY us, event_id) AS gap_us
        |      FROM e),
        |a AS (SELECT window_start_s, event_type, count(*)::BIGINT AS n_gaps,
        |        sum(gap_us)::BIGINT AS sum_gap_us,
        |        sum(gap_us::HUGEINT * gap_us)::DECIMAL(38,0) AS sum_gap_sq
        |      FROM g WHERE gap_us IS NOT NULL GROUP BY 1, 2)
        |SELECT window_start_s, event_type, n_gaps, sum_gap_us,
        |       sum_gap_sq::VARCHAR AS sum_gap_sq,
        |       sum_gap_us::DOUBLE / n_gaps::DOUBLE AS mean_gap_us,
        |       CASE WHEN sum_gap_us = 0 THEN NULL
        |            ELSE (n_gaps::DOUBLE * sum_gap_sq::DOUBLE
        |                  - sum_gap_us::DOUBLE * sum_gap_us::DOUBLE)
        |                 / (sum_gap_us::DOUBLE * sum_gap_us::DOUBLE) END AS cv2
        |FROM a ORDER BY window_start_s, event_type""".stripMargin,


    // the oracle affords the single global running sum the Spark side
    // deliberately decomposes; ties order +1 before -1 (closed
    // intervals), and the per-day max over equal-(us, delta) groups is
    // permutation-invariant, so both engines agree exactly
    "x148_peak_concurrency" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |w AS (SELECT user_id, us,
        |        CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
        |             THEN 1 ELSE 0 END AS brk
        |      FROM e),
        |s AS (SELECT user_id, us,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM w),
        |sess AS (SELECT user_id, sid, min(us) AS su, max(us) AS eu FROM s GROUP BY 1, 2),
        |deltas AS (SELECT su AS us, 1::BIGINT AS delta FROM sess
        |           UNION ALL SELECT eu, -1::BIGINT FROM sess),
        |run AS (SELECT us, delta, (us // 1000000 // 86400 * 86400)::BIGINT AS day_s,
        |               sum(delta) OVER (ORDER BY us, delta DESC ROWS UNBOUNDED PRECEDING) AS conc
        |        FROM deltas),
        |per AS (SELECT day_s, max(conc)::BIGINT AS abs_peak,
        |               count(*) FILTER (delta = 1)::BIGINT AS n_starts,
        |               count(*) FILTER (delta = -1)::BIGINT AS n_ends,
        |               sum(delta)::BIGINT AS net
        |        FROM run GROUP BY 1)
        |SELECT day_s, n_starts, n_ends,
        |       coalesce(sum(net) OVER (ORDER BY day_s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS open_at_start,
        |       sum(net) OVER (ORDER BY day_s ROWS UNBOUNDED PRECEDING)::BIGINT AS open_at_end,
        |       abs_peak AS peak_concurrent
        |FROM per ORDER BY day_s""".stripMargin,
  )
}
