package graft.queries

/**
 * DuckDB restatements of BehaviorQueries for the driver's correctness gate.
 * Sliding windows are expanded arithmetically: an event at epoch-second `sec`
 * falls into the size/slide windows whose start is
 * `((sec // slide) - k) * slide` for k in 0..(size/slide - 1) — exactly the
 * window set Spark's `window(ts, size, slide)` assigns (epoch-aligned).
 */
object BehaviorOracles {

  /** Shared CTE head: epoch seconds + JSON item key. */
  private val evt =
    "SELECT (epoch_us(ts) // 1000000) AS sec, user_id, event_type, " +
      "CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id FROM events"

  private def sliding(filter: String, keySel: String, keyGroup: String,
                      size: Long, slide: Long): String = {
    val nw = size / slide
    s"""WITH e AS ($evt${if (filter.isEmpty) "" else s" WHERE $filter"}),
       |w AS (
       |  SELECT ((sec // $slide) - g.k) * $slide AS window_start, e.*
       |  FROM e CROSS JOIN generate_series(0, ${nw - 1}) g(k)
       |)
       |SELECT window_start, window_start + $size AS window_end${if (keySel.isEmpty) "" else s", $keySel"},
       |       count(*) AS cnt
       |FROM w
       |GROUP BY window_start${if (keyGroup.isEmpty) "" else s", $keyGroup"}""".stripMargin
  }

  private def topN(inner: String, keyCol: String, n: Int): String =
    s"""WITH c AS ($inner)
       |SELECT window_start, window_end, $keyCol, cnt, rn FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY window_start ORDER BY cnt DESC, $keyCol ASC) AS rn
       |  FROM c
       |) WHERE rn <= $n""".stripMargin

  val hotItemsTopN: String = topN(
    sliding("event_type = 'view'", "item_id", "item_id", 3600, 900), "item_id", 3)

  val hotPagesTopN: String = topN(
    sliding("NOT regexp_matches(event_type, '^(error)$')",
      "event_type AS page", "event_type", 3600, 900), "page", 3)

  val pageViews: String =
    """SELECT (epoch_us(ts) // 1000000) // 3600 * 3600 AS window_start,
      |       (epoch_us(ts) // 1000000) // 3600 * 3600 + 3600 AS window_end,
      |       count(*) AS pv
      |FROM events WHERE event_type = 'view'
      |GROUP BY 1, 2""".stripMargin

  /** The log round-trip oracle skips the render→parse leg (an identity at
    * second precision under the UTC session) and derives the counts from
    * events directly — the engine side must reproduce them THROUGH its
    * real line renderer and parser. */
  val logHotPages: String =
    """SELECT concat('/', event_type, '/p', CAST(user_id % 50 AS VARCHAR),
      |         CASE WHEN user_id % 7 = 0 THEN '.css' ELSE '' END) AS url,
      |       (epoch_us(ts) // 1000000) // 3600 AS hour,
      |       count(*) AS cnt
      |FROM events
      |WHERE event_type IN ('view', 'click') AND user_id % 7 != 0
      |GROUP BY 1, 2""".stripMargin

  /** S3 mapping oracle: the same cyclic modular arithmetic over event_id. */
  val marketingSim: String =
    """WITH g AS (SELECT
      |  event_id % 1000 AS userId,
      |  ['CLICK', 'DOWNLOAD', 'INSTALL', 'UNINSTALL'][CAST(event_id % 4 + 1 AS INT)] AS behavior,
      |  ['app store', 'wechat', 'weibo', 'browser'][CAST((event_id // 4) % 4 + 1 AS INT)] AS channel
      |FROM events)
      |SELECT channel, behavior, count(*) AS cnt,
      |       count(DISTINCT userId) AS users
      |FROM g GROUP BY 1, 2""".stripMargin

  val uniqueVisitors: String =
    """SELECT (epoch_us(ts) // 1000000) // 86400 * 86400 AS window_start,
      |       (epoch_us(ts) // 1000000) // 86400 * 86400 + 86400 AS window_end,
      |       count(DISTINCT user_id) AS uv
      |FROM events WHERE event_type = 'view'
      |GROUP BY 1, 2""".stripMargin

  val marketChannel: String = {
    val inner = sliding("event_type <> 'error'",
      "'ch' || (user_id % 4) AS channel, event_type AS behavior",
      "user_id % 4, event_type", 3600, 900)
    s"""WITH m AS ($inner)
       |SELECT window_start, window_end,
       |       strftime(make_timestamp(window_end * 1000000), '%Y-%m-%d %H:%M:%S') AS window_time,
       |       channel, behavior, cnt
       |FROM m""".stripMargin
  }

  val marketTotal: String = sliding("event_type <> 'error'", "", "", 3600, 900)

  val adProvince: String = sliding("event_type = 'click'",
    "'p' || (item_id % 10) AS province", "item_id % 10", 3600, 900)

  /** uv_bitmap's custom aggregate is exact, so it shares the exact
    * count-distinct oracle (columns renamed). */
  val uvBitmap: String =
    """SELECT (epoch_us(ts) // 1000000) // 86400 * 86400 AS window_start,
      |       (epoch_us(ts) // 1000000) // 86400 * 86400 + 86400 AS window_end,
      |       count(DISTINCT user_id) AS uv
      |FROM events WHERE event_type = 'view'
      |GROUP BY 1, 2""".stripMargin

  /** [[BehaviorQueries.uvApproxBounds]] restatement: DuckDB recomputes
    * the exact per-window distinct and the declared-rsd error bound
    * (`max(⌈exact · 0.15⌉, 8)` — the same double multiply + ceil in both
    * engines, so the BIGINT bound is bit-identical), and asserts the
    * sketch verdict is literally TRUE. The HLL estimate itself never
    * appears in the gated row — only whether it honored its envelope. */
  val uvApproxBounds: String =
    """SELECT (epoch_us(ts) // 1000000) // 86400 * 86400 AS window_start,
      |       (epoch_us(ts) // 1000000) // 86400 * 86400 + 86400 AS window_end,
      |       count(DISTINCT user_id) AS uv_exact,
      |       greatest(CAST(ceil(CAST(count(DISTINCT user_id) AS DOUBLE) * 0.15) AS BIGINT), 8) AS bound_abs,
      |       TRUE AS within
      |FROM events WHERE event_type = 'view'
      |GROUP BY 1, 2""".stripMargin

  val eventValueStats: String =
    """SELECT event_type, count(*) AS cnt,
      |  CAST(SUM(CAST(CAST("value" AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_value_cents,
      |  CAST(SUM(CAST(CAST("value" AS DECIMAL(12,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_value
      |FROM events GROUP BY event_type""".stripMargin

  /** Sessionization as a gaps-and-islands query: a new session starts when
    * the gap from the previous event of the same user exceeds 2 h; session
    * end = last event + gap (Spark session_window semantics). */
  val userSessions: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us FROM events
      |), marked AS (
      |  SELECT user_id, us,
      |         CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w >= 7200000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
      |), sessions AS (
      |  SELECT user_id, us,
      |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked
      |)
      |SELECT user_id, min(us) // 1000000 AS window_start,
      |       (max(us) + 7200000000) // 1000000 AS window_end, count(*) AS cnt
      |FROM sessions GROUP BY user_id, sid""".stripMargin

  /** DuckDB has native ASOF JOIN — the oracle for the union-and-carry plan. */
  val eventsAsofSignup: String =
    """WITH e AS (SELECT event_id, user_id, ts, (epoch_us(ts) // 1000000) AS sec FROM events),
      |s AS (SELECT user_id, ts, event_id AS signup_id, (epoch_us(ts) // 1000000) AS signup_sec
      |      FROM events WHERE event_type = 'signup')
      |SELECT e.event_id, e.user_id, e.sec, s.signup_id, s.signup_sec
      |FROM e ASOF LEFT JOIN s ON e.user_id = s.user_id AND s.ts <= e.ts""".stripMargin

  /** [[BehaviorQueries.valuePercentileBounds]] restatement: DuckDB
    * recomputes (event_type, n, p, bound) arithmetically and asserts
    * the rank-envelope verdict is literally TRUE — the uv_approx_bounds
    * discipline for the percentile sketch. */
  val valuePercentileBounds: String =
    """WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1)
      |SELECT event_type, n, p,
      |  CAST(ceil(CAST(2 * n AS DOUBLE) / CAST(100 AS DOUBLE)) AS BIGINT) + 1 AS bound_rank,
      |  TRUE AS within
      |FROM g CROSS JOIN (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS p)""".stripMargin

  val valuePercentiles: String =
    """WITH r AS (
      |  SELECT event_type, "value",
      |         row_number() OVER (PARTITION BY event_type ORDER BY "value", event_id) AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events
      |)
      |SELECT event_type,
      |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN "value" END) AS p50,
      |  max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN "value" END) AS p90,
      |  max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN "value" END) AS p99
      |FROM r GROUP BY event_type""".stripMargin

  val eventsEnriched: String =
    """SELECT e.event_id, e.user_id, e.event_type,
      |       c.c_mktsegment AS segment, CAST(c.c_nationkey AS BIGINT) AS nation
      |FROM events e JOIN customer c ON c.c_custkey = e.user_id + 1""".stripMargin

  /** DuckDB dayofweek: dow() is 0=Sunday; Spark dayofweek() is 1=Sunday. */
  val activityByHour: String =
    """SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
      |       CAST(hour(ts) AS BIGINT) AS hod, count(*) AS cnt
      |FROM events GROUP BY 1, 2""".stripMargin

  val propsParsed: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events""".stripMargin

  val userRunningStats: String =
    """SELECT event_id, user_id, (epoch_us(ts) // 1000000) AS sec,
      |  count(*) OVER (PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000), event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt,
      |  (epoch_us(ts) // 1000000) - lag((epoch_us(ts) // 1000000)) OVER (
      |    PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000), event_id) AS gap_sec
      |FROM events""".stripMargin

  val funnelConversion: String =
    """WITH e AS (SELECT 'ch' || (user_id % 4) AS channel, user_id, event_type FROM events),
      |v AS (SELECT channel, count(DISTINCT user_id) AS viewers FROM e
      |      WHERE event_type = 'view' GROUP BY 1),
      |p AS (SELECT channel, count(DISTINCT user_id) AS purchasers FROM e
      |      WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT v.channel, v.viewers, coalesce(p.purchasers, 0) AS purchasers,
      |       CAST(coalesce(p.purchasers, 0) AS DOUBLE) / CAST(v.viewers AS DOUBLE) AS conversion
      |FROM v LEFT JOIN p ON v.channel = p.channel""".stripMargin

  val funnelSteps: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) // 1000000 AS sec FROM events),
      |v AS (SELECT user_id, min(sec) AS view_sec FROM e WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.sec) AS click_sec
      |      FROM e JOIN v ON v.user_id = e.user_id
      |      WHERE e.event_type = 'click' AND e.sec > v.view_sec GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.sec) AS purchase_sec
      |      FROM e JOIN c ON c.user_id = e.user_id
      |      WHERE e.event_type = 'purchase' AND e.sec > c.click_sec GROUP BY 1)
      |SELECT user_id, view_sec,
      |  coalesce(click_sec, -1) AS click_sec,
      |  coalesce(purchase_sec, -1) AS purchase_sec,
      |  CAST(CASE WHEN purchase_sec IS NOT NULL THEN 3
      |            WHEN click_sec IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS depth
      |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin

  /** Unrolled 3-round integer PageRank, one contribution+rank CTE pair per
    * round — the oracle twin of ClusterOps.pagerankFixed. */
  val itemPagerank: String = {
    val base =
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec,
        |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |           FROM events
        |           WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |raw AS (SELECT item AS src,
        |               lead(item) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS dst
        |        FROM e),
        |ed AS (SELECT DISTINCT src, dst FROM raw WHERE dst IS NOT NULL AND src <> dst),
        |o AS (SELECT src, count(*) AS outdeg FROM ed GROUP BY 1),
        |n AS (SELECT DISTINCT id FROM (SELECT src AS id FROM ed UNION ALL SELECT dst FROM ed)),
        |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM n)""".stripMargin
    val rounds = (1 to 3).map { i =>
      s"""c$i AS (SELECT ed.dst AS dst, SUM(r${i - 1}.rank // o.outdeg) AS s
         |       FROM ed JOIN r${i - 1} ON r${i - 1}.id = ed.src
         |       JOIN o ON o.src = ed.src GROUP BY 1),
         |r$i AS (SELECT id, CAST(150000 + 85 * coalesce(s, 0) // 100 AS BIGINT) AS rank
         |       FROM n LEFT JOIN c$i ON c$i.dst = n.id)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$rounds\nSELECT id AS item_id, rank FROM r3"
  }

  val retentionCohorts: String =
    """WITH wk AS (SELECT user_id, epoch_us(ts) // 1000000 // 86400 // 7 AS week FROM events),
      |c AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, week FROM wk)
      |SELECT cohort_week, week - cohort_week AS week_offset,
      |       count(*) AS active_users
      |FROM a JOIN c USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  val volumeAnomalies: String =
    """WITH h AS (SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS hour,
      |                  count(*) AS cnt
      |           FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, hour, cnt,
      |        CAST(coalesce(SUM(cnt) OVER w, 0) AS BIGINT) AS trail_sum,
      |        CAST(count(*) OVER w AS BIGINT) AS trail_n
      |      FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hour
      |                          ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, hour, cnt, trail_sum, trail_n,
      |  trail_n >= 12 AND cnt * trail_n > 2 * trail_sum AS anomalous
      |FROM t""".stripMargin

  val itemPairs: String =
    """WITH b AS (SELECT DISTINCT user_id,
      |                  CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
      |           FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL),
      |p AS (SELECT a.item AS item_a, b2.item AS item_b, count(*) AS n_users
      |      FROM b a JOIN b b2 ON a.user_id = b2.user_id AND a.item < b2.item
      |      GROUP BY 1, 2)
      |SELECT item_a, item_b, n_users, rn FROM (
      |  SELECT item_a, item_b, n_users,
      |         CAST(row_number() OVER (ORDER BY n_users DESC, item_a ASC, item_b ASC) AS BIGINT) AS rn
      |  FROM p)
      |WHERE rn <= 20""".stripMargin

  val skewProfile: String =
    """WITH f AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
      |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
      |             CAST(count(*) AS BIGINT) AS n_keys FROM f),
      |r AS (SELECT user_id, cnt,
      |        CAST(row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS BIGINT) AS rn
      |      FROM f)
      |SELECT user_id, cnt, rn, total_rows, n_keys,
      |       CAST(cnt * 1000000 // total_rows AS BIGINT) AS share_ppm
      |FROM r CROSS JOIN t WHERE rn <= 10""".stripMargin

  /** [[BehaviorQueries.eventTransitions]] restatement: same lead window
    * ordered by (ts, event_id), same cell aggregation, totals as window
    * sums over the |types|²-row frame. */
  val eventTransitions: String =
    """WITH s AS (SELECT user_id, event_type, ts, event_id,
      |        lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |      FROM events),
      |c AS (SELECT event_type AS from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |      FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
      |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_ppm
      |FROM c""".stripMargin

  /** [[BehaviorQueries.eventPaths]] restatement: the same (ts, event_id)
    * order carrying both leads, the trigram cell aggregation, context
    * totals as window sums over the |types|³ frame. */
  val eventPaths: String =
    """WITH s AS (SELECT user_id, event_type, ts, event_id,
      |        lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS mid_type,
      |        lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |      FROM events),
      |c AS (SELECT event_type AS from_type, mid_type, to_type, CAST(count(*) AS BIGINT) AS n
      |      FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2, 3)
      |SELECT from_type, mid_type, to_type, n,
      |  CAST(SUM(n) OVER (PARTITION BY from_type, mid_type) AS BIGINT) AS n_ctx,
      |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type, mid_type) AS BIGINT) AS p_ppm
      |FROM c""".stripMargin

  /** [[BehaviorQueries.transitionDrift]] restatement: one lead window,
    * conditional per-half cell sums, whole-frame totals as `OVER ()`
    * window sums, the same integer-ppm drift arithmetic. */
  val transitionDrift: String =
    """WITH s AS (SELECT user_id, event_type, ts, event_id,
      |        lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |      FROM events),
      |c AS (SELECT event_type AS from_type, to_type,
      |        CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
      |        CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      |      FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, to_type, n_ref, n_cur,
      |        SUM(n_ref) OVER () AS t_ref, SUM(n_cur) OVER () AS t_cur
      |      FROM c)
      |SELECT from_type, to_type, n_ref, n_cur,
      |  CAST(n_ref * 1000000 // t_ref AS BIGINT) AS ref_ppm,
      |  CAST(n_cur * 1000000 // t_cur AS BIGINT) AS cur_ppm,
      |  CAST(abs(n_ref * 1000000 // t_ref - n_cur * 1000000 // t_cur) AS BIGINT) AS drift_ppm
      |FROM t""".stripMargin

  /** [[BehaviorQueries.pathLift]] restatement: one window pass carrying
    * both leads, train-half argmax models with the same (n DESC, type
    * ASC) tie-break, bigram backoff via coalesce, one aggregate row
    * unpivoted to the two model rows. */
  val pathLift: String =
    """WITH s AS (SELECT user_id, event_type,
      |        lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS mid_type,
      |        lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |      FROM events),
      |bp AS (SELECT event_type AS f, mid_type AS t, count(*) AS n
      |       FROM s WHERE mid_type IS NOT NULL AND user_id % 2 = 0 GROUP BY 1, 2),
      |bpred AS (SELECT f, t AS bi_pred FROM (
      |    SELECT *, row_number() OVER (PARTITION BY f ORDER BY n DESC, t ASC) AS rn FROM bp)
      |  WHERE rn = 1),
      |tp AS (SELECT event_type AS f, mid_type AS m, to_type AS t, count(*) AS n
      |       FROM s WHERE to_type IS NOT NULL AND user_id % 2 = 0 GROUP BY 1, 2, 3),
      |tpred AS (SELECT f, m, t AS tri_pred0 FROM (
      |    SELECT *, row_number() OVER (PARTITION BY f, m ORDER BY n DESC, t ASC) AS rn FROM tp)
      |  WHERE rn = 1),
      |cases AS (SELECT event_type AS f, mid_type AS m, to_type AS t
      |          FROM s WHERE to_type IS NOT NULL AND user_id % 2 = 1),
      |ej AS (SELECT c.t, b.bi_pred, coalesce(tp2.tri_pred0, b.bi_pred) AS tri_pred
      |       FROM cases c LEFT JOIN bpred b ON b.f = c.m
      |       LEFT JOIN tpred tp2 ON tp2.f = c.f AND tp2.m = c.m),
      |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_cases,
      |               CAST(SUM(CASE WHEN bi_pred = t THEN 1 ELSE 0 END) AS BIGINT) AS bi_hits,
      |               CAST(SUM(CASE WHEN tri_pred = t THEN 1 ELSE 0 END) AS BIGINT) AS tri_hits
      |        FROM ej)
      |SELECT 'bigram' AS model, n_cases, bi_hits AS n_hits,
      |       CAST(bi_hits * 1000000 // n_cases AS BIGINT) AS acc_ppm FROM agg
      |UNION ALL
      |SELECT 'trigram' AS model, n_cases, tri_hits AS n_hits,
      |       CAST(tri_hits * 1000000 // n_cases AS BIGINT) AS acc_ppm FROM agg""".stripMargin

  /** [[BehaviorQueries.pathPpl]] restatement: the same train counts,
    * Laplace ratios, per-case `round(1e6·ln)` quantization and exact
    * integer loss sums. */
  val pathPpl: String =
    """WITH s AS (SELECT user_id, event_type,
      |        lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS mid_type,
      |        lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |      FROM events),
      |vt AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS v FROM s WHERE user_id % 2 = 0),
      |n2 AS (SELECT event_type AS b2, mid_type AS c2, CAST(count(*) AS BIGINT) AS n2
      |       FROM s WHERE mid_type IS NOT NULL AND user_id % 2 = 0 GROUP BY 1, 2),
      |n1 AS (SELECT b2 AS b1, CAST(SUM(n2) AS BIGINT) AS n1 FROM n2 GROUP BY 1),
      |n3 AS (SELECT event_type AS a3, mid_type AS b3, to_type AS c3, CAST(count(*) AS BIGINT) AS n3
      |       FROM s WHERE to_type IS NOT NULL AND user_id % 2 = 0 GROUP BY 1, 2, 3),
      |nc AS (SELECT a3 AS ac, b3 AS bc, CAST(SUM(n3) AS BIGINT) AS nctx FROM n3 GROUP BY 1, 2),
      |cases AS (SELECT event_type AS a, mid_type AS b, to_type AS c
      |          FROM s WHERE to_type IS NOT NULL AND user_id % 2 = 1),
      |ej AS (SELECT
      |    -CAST(round(1000000.0 * ln(CAST(coalesce(n2.n2, 0) + 1 AS DOUBLE)
      |      / CAST(coalesce(n1.n1, 0) + vt.v AS DOUBLE))) AS BIGINT) AS bi_loss,
      |    -CAST(round(1000000.0 * ln(CAST(coalesce(n3.n3, 0) + 1 AS DOUBLE)
      |      / CAST(coalesce(nc.nctx, 0) + vt.v AS DOUBLE))) AS BIGINT) AS tri_loss
      |  FROM cases
      |  LEFT JOIN n2 ON n2.b2 = cases.b AND n2.c2 = cases.c
      |  LEFT JOIN n1 ON n1.b1 = cases.b
      |  LEFT JOIN n3 ON n3.a3 = cases.a AND n3.b3 = cases.b AND n3.c3 = cases.c
      |  LEFT JOIN nc ON nc.ac = cases.a AND nc.bc = cases.b
      |  CROSS JOIN vt),
      |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_cases,
      |               CAST(SUM(bi_loss) AS BIGINT) AS bi_total,
      |               CAST(SUM(tri_loss) AS BIGINT) AS tri_total FROM ej)
      |SELECT 'bigram' AS model, n_cases, bi_total AS loss_total_micro,
      |       CAST(bi_total // n_cases AS BIGINT) AS loss_mean_micro FROM agg
      |UNION ALL
      |SELECT 'trigram' AS model, n_cases, tri_total AS loss_total_micro,
      |       CAST(tri_total // n_cases AS BIGINT) AS loss_mean_micro FROM agg""".stripMargin

  /** [[BehaviorQueries.pathAnomalies]] restatement: the same model CTEs,
    * the same per-case micro-nat loss, all-corpus cases, (loss DESC, full
    * key ASC) top-50. */
  val pathAnomalies: String =
    """WITH s AS (SELECT user_id, event_type,
      |        lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS mid_type,
      |        lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |      FROM events),
      |vt AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS v FROM s WHERE user_id % 2 = 0),
      |n3 AS (SELECT event_type AS a3, mid_type AS b3, to_type AS c3, CAST(count(*) AS BIGINT) AS n3
      |       FROM s WHERE to_type IS NOT NULL AND user_id % 2 = 0 GROUP BY 1, 2, 3),
      |nc AS (SELECT a3 AS ac, b3 AS bc, CAST(SUM(n3) AS BIGINT) AS nctx FROM n3 GROUP BY 1, 2),
      |cases AS (SELECT user_id, event_type AS f, mid_type AS m, to_type AS t
      |          FROM s WHERE to_type IS NOT NULL),
      |ej AS (SELECT user_id, f AS from_type, m AS mid_type, t AS to_type,
      |    -CAST(round(1000000.0 * ln(CAST(coalesce(n3.n3, 0) + 1 AS DOUBLE)
      |      / CAST(coalesce(nc.nctx, 0) + vt.v AS DOUBLE))) AS BIGINT) AS loss_micro
      |  FROM cases
      |  LEFT JOIN n3 ON n3.a3 = cases.f AND n3.b3 = cases.m AND n3.c3 = cases.t
      |  LEFT JOIN nc ON nc.ac = cases.f AND nc.bc = cases.m
      |  CROSS JOIN vt),
      |g AS (SELECT user_id, from_type, mid_type, to_type, loss_micro, CAST(count(*) AS BIGINT) AS n
      |      FROM ej GROUP BY 1, 2, 3, 4, 5)
      |SELECT user_id, from_type, mid_type, to_type, loss_micro, n FROM g
      |ORDER BY loss_micro DESC, user_id ASC, from_type ASC, mid_type ASC, to_type ASC
      |LIMIT 50""".stripMargin

  val all: Map[String, String] = Map(
    "event_paths"        -> eventPaths,
    "transition_drift"   -> transitionDrift,
    "path_lift"          -> pathLift,
    "path_ppl"           -> pathPpl,
    "path_anomalies"     -> pathAnomalies,
    "event_transitions"  -> eventTransitions,
    "skew_profile"       -> skewProfile,
    "item_pairs"         -> itemPairs,
    "volume_anomalies"   -> volumeAnomalies,
    "retention_cohorts"  -> retentionCohorts,
    "item_pagerank"      -> itemPagerank,
    "funnel_steps"       -> funnelSteps,
    "funnel_conversion"  -> funnelConversion,
    "user_running_stats" -> userRunningStats,
    "activity_by_hour"   -> activityByHour,
    "props_parsed"       -> propsParsed,
    "events_enriched"    -> eventsEnriched,
    "events_asof_signup" -> eventsAsofSignup,
    "value_percentiles"  -> valuePercentiles,
    "user_sessions"     -> userSessions,
    "event_value_stats" -> eventValueStats,
    "uv_bitmap"       -> uvBitmap,
    "uv_approx_bounds" -> uvApproxBounds,
    "value_percentile_bounds" -> valuePercentileBounds,
    "hot_items_topn"  -> hotItemsTopN,
    "hot_pages_topn"  -> hotPagesTopN,
    "log_hot_pages"   -> logHotPages,
    "marketing_sim"   -> marketingSim,
    "page_views"      -> pageViews,
    "unique_visitors" -> uniqueVisitors,
    "market_channel"  -> marketChannel,
    "market_total"    -> marketTotal,
    "ad_province"     -> adProvince,
  )
}
