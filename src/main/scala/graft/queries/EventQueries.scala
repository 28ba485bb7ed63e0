package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.EventStreams

/** Event-table surface: JSON extraction, event-time tumbling/sliding
  * windows, gap-based sessionization — the batch faces of the
  * [[graft.streaming.EventStreams]] transforms (identical code paths;
  * `withWatermark` no-ops on batch). Window starts are output as epoch
  * seconds (BIGINT) to keep the cross-engine compare timezone-proof.
  */
object EventQueries extends QueryGroup {

  private def events(s: SparkSession, dir: String) = Tables.loadEvents(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // JSON extraction (get_json_object) + aggregation
    "q_json_extract" -> ((s, dir) =>
      events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          count(when(col("k").isNull, 1)).as("n_null"))),

    "q_time_tumbling" -> ((s, dir) =>
      EventStreams.tumblingCounts(events(s, dir))
        .select(col("window_start").cast("long").as("window_start_s"),
          col("event_type"), col("n"), col("total"))),

    // time-series resample + forward fill: each user's value series onto
    // an hourly grid between that user's first and last observation,
    // gaps carrying the last observed value — the feature-engineering
    // regularization step. Grid generation is a distributed
    // sequence-explode (rows ∝ users × buckets, no driver loop); the
    // fill is one ignoreNulls running window per user.
    "q_resample" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val step = 3600L
      val e = events(s, dir).select(col("user_id"), col("event_id"), col("value"),
        col("ts").cast("long").as("sec"))
        .withColumn("bucket", col("sec") - pmod(col("sec"), lit(step)))
      val lastPerBucket = Window.partitionBy(col("user_id"), col("bucket"))
        .orderBy(col("sec").desc, col("event_id").desc)
      val obs = e.withColumn("rn", row_number().over(lastPerBucket))
        .filter(col("rn") === 1).select("user_id", "bucket", "value")
      val grid = e.groupBy("user_id")
        .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), lit(step))).as("bucket"))
      val fill = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, Seq("user_id", "bucket"), "left_outer")
        .select(col("user_id"), col("bucket"),
          last(col("value"), ignoreNulls = true).over(fill).as("filled"))
    }),

    // batch face of the stream-stream time-bounded join (view→click
    // within 15 min, state-bounded by watermark on a real stream)
    "q_stream_correlate" -> ((s, dir) => {
      val e = events(s, dir)
      EventStreams.correlate(
        e.filter(col("event_type") === "view"),
        e.filter(col("event_type") === "click"), "15 minutes")
    }),

    "q_time_sliding" -> ((s, dir) =>
      EventStreams.slidingCounts(events(s, dir))
        .select(col("window_start").cast("long").as("window_start_s"),
          col("event_type"), col("n"))),

    "q_session_window" -> ((s, dir) =>
      EventStreams.sessionize(events(s, dir))
        .select(col("user_id"),
          col("session_start").cast("long").as("session_start_s"),
          col("n_events"), col("sum_value"))),

    // the SAME two transforms, but executed by the actual streaming
    // runtime: file source → watermarked agg → AvailableNow → distributed
    // parquet sink. Shares the batch entries' oracles — proving
    // write-once/run-both-ways end-to-end on the real source path.
    "q_stream_tumbling_runtime" -> ((s, dir) =>
      graft.streaming.StreamRuntime.runAvailableNow(s,
          graft.streaming.StreamRuntime.eventsStreamSource(s, dir),
          EventStreams.tumblingCounts(_))
        .select(col("window_start").cast("long").as("window_start_s"),
          col("event_type"), col("n"), col("total"))),

    "q_stream_session_runtime" -> ((s, dir) =>
      graft.streaming.StreamRuntime.runAvailableNow(s,
          graft.streaming.StreamRuntime.eventsStreamSource(s, dir),
          EventStreams.sessionize(_))
        .select(col("user_id"),
          col("session_start").cast("long").as("session_start_s"),
          col("n_events"), col("sum_value"))),

    // as-of join (funnel attribution): each purchase gets the latest
    // click at-or-before it per user; no pairwise blowup (union+window)
    "q_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "value")
      graft.operators.TemporalJoins.asofJoin(purchases, clicks, "user_id", "ts",
          valueCols = Seq("ts", "value"))
        .select(col("event_id"), col("user_id"), col("ts").cast("long").as("ts_s"),
          col("asof_ts").cast("long").as("click_ts_s"),
          col("asof_value").as("click_value"))
    }),

    // lag/lead windows: per-user event transitions with inter-event gaps
    "q_window_lag" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("gap_s", round(col("ts").cast("double") -
          lag(col("ts"), 1).over(w).cast("double"), 6))
        .select("event_id", "user_id", "event_type", "prev_type", "next_type", "gap_s")
    }),

    // banded range join: same-user event pairs within 300 s
    "q_range_join" -> ((s, dir) =>
      graft.operators.TemporalJoins.rangeJoin(events(s, dir),
          key = "user_id", ts = "ts", idCol = "event_id", windowSec = 300)
        .select(col("user_id"), col("id_a"), col("id_b"), round(col("gap_s"), 6).as("gap_s"))),

    // sequential-pattern funnel: each user's earliest strictly-ordered
    // view → click → purchase times (one row per user per step-1 entry,
    // nulls once the user drops out); per-step joins carry one row per
    // user — never the user's event history
    "q_funnel" -> ((s, dir) =>
      graft.operators.Funnel.funnelTimes(events(s, dir),
          Seq("view", "click", "purchase"))
        .select(col("user_id"),
          col("t1").cast("long").as("t1_s"),
          col("t2").cast("long").as("t2_s"),
          col("t3").cast("long").as("t3_s"))),

    // the step-level summary a dashboard consumes: users reaching each
    // step + conversion vs step 1 (exact small-int division, rounded)
    "q_funnel_rates" -> ((s, dir) =>
      graft.operators.Funnel.funnelReport(events(s, dir),
          Seq("view", "click", "purchase"))
        .select(col("step"), col("step_type"), col("n_users"),
          round(col("conversion"), 6).as("conversion"))),

    // first-order Markov transition model over each user's event
    // sequence: P(next event type | current) — the behavioral-model
    // summary a funnel generalizes to. Denominator via groupBy + join
    // (not a window over the 4-value type key)
    "q_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val tr = events(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type").agg(count(lit(1)).as("n"))
      val tot = tr.groupBy("prev_type").agg(sum(col("n")).as("tot"))
      tr.join(broadcast(tot), "prev_type")
        .select(col("prev_type"), col("event_type"), col("n"),
          round(col("n").cast("double") / col("tot").cast("double"), 6).as("p"))
    }),

    // robust outlier flagging per event type: median/MAD z-score — the
    // estimator the outliers themselves can't poison (unlike mean/std);
    // two exact-percentile aggregate passes, stats broadcast back
    "q_outliers" -> ((s, dir) =>
      graft.operators.Distribution.robustOutliers(events(s, dir),
        "event_type", "event_id", "value", cut = 3.0)),

    // cohort retention triangle: users grouped by first-event week,
    // counted per activity-week offset — user-keyed exchanges only
    "q_cohort_retention" -> ((s, dir) =>
      graft.operators.Retention.cohortRetention(events(s, dir))),

    // population-stability-index drift between the even/odd event halves
    // per event type — exact integer shares, decimal-summed contributions
    "q_psi_drift" -> ((s, dir) =>
      graft.operators.Drift.psi(events(s, dir), "event_type", "value",
        col("event_id") % 2 === 0, col("event_id") % 2 === 1, 50.0)),

    // winsorization: clip to the [p05, p95] per-type percentiles — the
    // heavy-tail taming pass; one percentile agg + broadcast join back
    "q_winsorize" -> ((s, dir) =>
      graft.operators.Distribution.winsorize(events(s, dir),
        "event_type", "event_id", "value", 0.05, 0.95)),

    // per-type OLS trend from exact decimal co-moments (x scaled to days
    // so round(x²,6) sums stay inside DECIMAL(27,6) — the operator's
    // documented precision contract)
    "q_linreg" -> ((s, dir) =>
      graft.operators.Regression.linearFit(
        events(s, dir).withColumn("x",
          (col("ts").cast("long") - lit(1704067200L)).cast("double") / 86400.0),
        "event_type", "x", "value")),

    // pre-aggregated distinct-count rollup: per-(day, type) KMV states
    // persisted once, the all-time distinct-users answer produced by
    // MERGING stored sketches (exact merge ⇒ identical to a direct
    // sketch over raw events — which is what the oracle computes)
    "q_sketch_rollup" -> ((s, dir) => {
      import graft.operators.SketchStore
      val k = RelationalQueries.KmvK
      val path = QueryGroup.scratchDir("graft-sketchstore")
      SketchStore.write(
        events(s, dir).withColumn("day", to_date(col("ts"))),
        path, "day", "event_type", "user_id", k)
      SketchStore.mergedEstimate(s, path, k)
        .select(col("grp").as("event_type"), col("n_buckets").as("n_days"),
          col("approx").as("approx_users"))
    }),
  )

  private val TumblingSql =
    """SELECT floor(epoch(time_bucket(INTERVAL '1 hour', ts)))::BIGINT AS window_start_s,
              event_type, count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total
       FROM events GROUP BY 1, 2"""

  // gaps-and-islands replication of session_window (gap-exclusive: a
  // diff of exactly 30 min starts a new session, matching Spark's
  // [start, last+gap) windows)
  private val SessionSql =
    """WITH flagged AS (
         SELECT user_id, event_id, ts, value,
                CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          >= INTERVAL '30 minutes'
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     THEN 1 ELSE 0 END AS new_s
         FROM events),
       sess AS (
         SELECT user_id, ts, value,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM flagged)
       SELECT user_id,
              floor(epoch(min(ts)))::BIGINT AS session_start_s,
              count(*) AS n_events,
              CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
       FROM sess GROUP BY user_id, sid"""

  def oracles: Map[String, String] = Map(
    // direct KMV over raw events — by the exact-merge property this IS
    // what the stored-sketch merge computes (same estimator family as
    // q_kmv_distinct)
    "q_sketch_rollup" -> {
      val k = RelationalQueries.KmvK
      s"""WITH h AS (SELECT DISTINCT event_type AS grp,
                            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
                     FROM events),
              r AS (SELECT grp, h,
                           row_number() OVER (PARTITION BY grp ORDER BY h ASC) AS rn
                    FROM h),
              s AS (SELECT grp, count(*) AS n, max(h) AS hk
                    FROM r WHERE rn <= $k GROUP BY grp),
              d AS (SELECT event_type AS grp,
                           count(DISTINCT CAST(ts AS DATE)) AS n_days
                    FROM events GROUP BY 1)
         SELECT s.grp AS event_type, d.n_days,
                CASE WHEN n < $k THEN n
                     ELSE CAST(floor(${k - 1} * 1152921504606846976.0 / hk) AS BIGINT)
                END AS approx_users
         FROM s JOIN d USING (grp)"""
    },

    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                CAST(count(*) FILTER (WHERE json_extract_string(props, '$.k') IS NULL) AS BIGINT) AS n_null
         FROM events GROUP BY event_type""",

    "q_time_tumbling" -> TumblingSql,

    "q_resample" ->
      """WITH b AS (SELECT user_id, event_id, value,
                           floor(epoch(ts))::BIGINT AS sec,
                           floor(epoch(ts))::BIGINT - floor(epoch(ts))::BIGINT % 3600 AS bucket
                    FROM events),
              obs AS (SELECT user_id, bucket, value FROM (
                        SELECT user_id, bucket, value,
                               row_number() OVER (PARTITION BY user_id, bucket
                                                  ORDER BY sec DESC, event_id DESC) AS rn
                        FROM b) WHERE rn = 1),
              spans AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
                        FROM b GROUP BY 1),
              grid AS (SELECT user_id, unnest(range(lo, hi + 3600, 3600)) AS bucket
                       FROM spans),
              j AS (SELECT g.user_id, g.bucket, o.value
                    FROM grid g LEFT JOIN obs o USING (user_id, bucket))
         SELECT user_id, bucket,
                last_value(value IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         FROM j""",

    // the streaming-runtime twins answer the exact same questions — the
    // oracle is shared with the batch entries by construction
    "q_stream_tumbling_runtime" -> TumblingSql,
    "q_stream_session_runtime" -> SessionSql,

    // each event belongs to exactly two 1h/30m sliding windows:
    "q_stream_correlate" ->
      """SELECT l.user_id, l.event_id AS l_id, l.event_type AS l_type,
                r.event_id AS r_id, r.event_type AS r_type,
                floor(epoch(l.ts))::BIGINT AS l_ts,
                floor(epoch(r.ts))::BIGINT AS r_ts
         FROM events l JOIN events r
           ON l.user_id = r.user_id
          AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL '15 minutes'
          AND l.event_id <> r.event_id
         WHERE l.event_type = 'view' AND r.event_type = 'click'""",

    // the 30-min bucket it falls in and the one 30 min earlier
    "q_time_sliding" ->
      """SELECT floor(epoch(ws))::BIGINT AS window_start_s, event_type, count(*) AS n
         FROM (SELECT event_type,
                      unnest([time_bucket(INTERVAL '30 minutes', ts),
                              time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
               FROM events)
         GROUP BY 1, 2""",

    "q_session_window" -> SessionSql,

    "q_asof_join" ->
      """SELECT l.event_id, l.user_id,
                floor(epoch(l.ts))::BIGINT AS ts_s,
                floor(epoch(r.ts))::BIGINT AS click_ts_s,
                r.value AS click_value
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
         ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') r
           ON l.user_id = r.user_id AND l.ts >= r.ts""",

    "q_window_lag" ->
      """SELECT event_id, user_id, event_type,
                lag(event_type, 1) OVER w AS prev_type,
                lead(event_type, 1) OVER w AS next_type,
                round(epoch(ts) - lag(epoch(ts), 1) OVER w, 6) AS gap_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""",

    "q_range_join" ->
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
                round(epoch(b.ts) - epoch(a.ts), 6) AS gap_s
         FROM events a JOIN events b
           ON a.user_id = b.user_id AND a.ts < b.ts
          AND epoch(b.ts) - epoch(a.ts) <= 300""",

    "q_funnel" -> s"""$FunnelSteps
         SELECT s1.user_id,
                floor(epoch(t1))::BIGINT AS t1_s,
                floor(epoch(t2))::BIGINT AS t2_s,
                floor(epoch(t3))::BIGINT AS t3_s
         FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""",

    "q_funnel_rates" -> s"""$FunnelSteps,
              c AS (SELECT (SELECT count(*) FROM s1) AS c1,
                           (SELECT count(*) FROM s2) AS c2,
                           (SELECT count(*) FROM s3) AS c3)
         SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_type,
                c1 AS n_users, CAST(1.0 AS DOUBLE) AS conversion FROM c
         UNION ALL
         SELECT 2, 'click', c2, round(CAST(c2 AS DOUBLE) / c1, 6) FROM c
         UNION ALL
         SELECT 3, 'purchase', c3, round(CAST(c3 AS DOUBLE) / c1, 6) FROM c""",

    "q_transitions" ->
      """WITH tr AS (SELECT lag(event_type) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id) AS prev_type,
                            event_type
                     FROM events),
              c AS (SELECT prev_type, event_type, count(*) AS n
                    FROM tr WHERE prev_type IS NOT NULL GROUP BY 1, 2),
              t AS (SELECT prev_type, sum(n) AS tot FROM c GROUP BY 1)
         SELECT c.prev_type, c.event_type, c.n,
                round(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS p
         FROM c JOIN t USING (prev_type)""",

    "q_cohort_retention" ->
      """WITH w AS (SELECT DISTINCT user_id,
                           floor(epoch(ts))::BIGINT - floor(epoch(ts))::BIGINT % 604800 AS week
                    FROM events),
              c AS (SELECT user_id, min(week) AS cohort_week_s FROM w GROUP BY 1)
         SELECT c.cohort_week_s,
                CAST((w.week - c.cohort_week_s) // 604800 AS BIGINT) AS week_offset,
                count(*) AS n_users
         FROM w JOIN c USING (user_id)
         GROUP BY 1, 2""",

    "q_psi_drift" ->
      """WITH ref AS (SELECT event_type AS grp,
                             CAST(floor(value / 50.0) AS BIGINT) AS bucket,
                             count(*) AS n_ref
                      FROM events WHERE event_id % 2 = 0 GROUP BY 1, 2),
              rt AS (SELECT grp, bucket, n_ref,
                            sum(n_ref) OVER (PARTITION BY grp) AS t_ref FROM ref),
              cmp AS (SELECT event_type AS grp,
                             CAST(floor(value / 50.0) AS BIGINT) AS bucket,
                             count(*) AS n_cmp
                      FROM events WHERE event_id % 2 = 1 GROUP BY 1, 2),
              ct AS (SELECT grp, bucket, n_cmp,
                            sum(n_cmp) OVER (PARTITION BY grp) AS t_cmp FROM cmp),
              j AS (SELECT rt.grp, rt.bucket,
                           CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE) AS p,
                           CAST(n_cmp AS DOUBLE) / CAST(t_cmp AS DOUBLE) AS q
                    FROM rt JOIN ct USING (grp, bucket))
         SELECT grp AS event_type, count(*) AS n_buckets_compared,
                round(CAST(sum(CAST(round((p - q) * ln(p / q), 9) AS DECIMAL(25,9))) AS DOUBLE), 6) AS psi
         FROM j GROUP BY 1""",

    "q_winsorize" ->
      """WITH cuts AS (SELECT event_type,
                              round(quantile_cont(value, 0.05), 6) AS p_lo,
                              round(quantile_cont(value, 0.95), 6) AS p_hi
                       FROM events GROUP BY 1)
         SELECT e.event_type, e.event_id, e.value,
                CASE WHEN e.value < c.p_lo THEN c.p_lo
                     WHEN e.value > c.p_hi THEN c.p_hi
                     ELSE e.value END AS clipped
         FROM events e JOIN cuts c USING (event_type)""",

    // co-moment twins of Regression.linearFit, term for term
    "q_linreg" -> {
      def ds(e: String) = s"CAST(sum(CAST(round($e, 6) AS DECIMAL(27,6))) AS DOUBLE)"
      s"""WITH b AS (SELECT event_type,
                            CAST(floor(epoch(ts))::BIGINT - 1704067200 AS DOUBLE) / 86400.0 AS x,
                            value AS y
                     FROM events),
              m AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
                           ${ds("x")} AS sx, ${ds("y")} AS sy,
                           ${ds("x * x")} AS sxx, ${ds("x * y")} AS sxy
                    FROM b GROUP BY 1)
         SELECT event_type, CAST(n AS BIGINT) AS n,
                round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
                round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept
         FROM m"""
    },

    // median/MAD twins of Distribution.robustOutliers: the filter runs
    // on the UNROUNDED score (as the Spark side does), output rounded
    "q_outliers" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                      FROM events GROUP BY 1),
              m2 AS (SELECT e.event_type, e.event_id, e.value, med.med
                     FROM events e JOIN med USING (event_type)),
              mad AS (SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
                      FROM m2 GROUP BY 1)
         SELECT m2.event_type, m2.event_id, m2.value,
                round((m2.value - m2.med) / (1.4826 * mad.mad), 6) AS rz
         FROM m2 JOIN mad USING (event_type)
         WHERE abs((m2.value - m2.med) / (1.4826 * mad.mad)) > 3.0""",
  )

  // shared step CTEs for the funnel pair (earliest strictly-ordered
  // step times per user — the exact semantics of Funnel.funnelTimes)
  private val FunnelSteps =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                   WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                   JOIN s1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                   JOIN s2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)"""
}
