package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series / windowed analytics over the `events` fixture (the
  * stream-shaped table; SURVEY.md §2.5 maps the reference's absent streaming
  * surface to Spark's `window`/`session_window` — exercised here in batch
  * mode; the Structured Streaming path over the same operators lives in
  * StreamingSuite).
  *
  * Engine-parity rules:
  *  - events.ts is normalized by [[Tables.events]] to session-tz
  *    TIMESTAMP(MICROS) regardless of fixture generation (nanos-as-long,
  *    TIMESTAMP_NTZ micros, or session-tz); any oracle comparing
  *    sub-second arithmetic truncates with
  *    date_trunc('microseconds', ts) first;
  *  - durations are summed in integer MICROSECONDS (exact), never double
  *    seconds (a sum landing exactly on a rounding boundary would flip);
  *  - `value` sums go through DECIMAL(18,6) (exact, order-independent) and
  *    are rounded IN THE DECIMAL DOMAIN — round() on a double that
  *    shortest-prints as .XXXX5 differs between Spark (decimal-string
  *    half-up) and DuckDB (binary) — averages use floor-scaling instead;
  *  - Spark session semantics: a gap >= the timeout starts a new session
  *    (window end = last event + gap, end-exclusive) — the oracle's
  *    lag-based sessionization mirrors that with `>= INTERVAL`.
  *
  * Scale notes: tumbling/sliding windows are plain hash aggregates on
  * (bucket, keys) — partial+final, no skew; session windows shuffle once on
  * user_id and sort within partitions (Spark plans UpdatingSessionsExec);
  * sliding windows multiply rows by window/slide (here 2×) before the
  * partial agg, which is the standard spark windowing cost model.
  */
object Events {

  /** Tumbling 1-hour windows per event type. */
  private def ev01Tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("sv"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sv"))
      .orderBy(col("w_start"), col("event_type"))

  /** Sliding windows: 1 hour long, every 30 minutes (each event lands in
    * exactly 2 windows). */
  private def ev02Sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("dau"),
        round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("sv"))
      .select(col("w.start").as("w_start"), col("n"), col("dau"), col("sv"))
      .orderBy(col("w_start"))

  /** Session windows (5-minute inactivity gap) rolled up per user. */
  private def ev03Session(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "5 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n")).as("n_events"),
        max(col("n")).as("max_n"),
        sum(unix_micros(col("sw.end")) - unix_micros(col("sw.start"))).as("dur_us"))
      .orderBy(col("user_id"))

  /** Daily rollup: DAU, counts, conditional aggregates. */
  private def ev04Daily(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(
        countDistinct(col("user_id")).as("dau"),
        count(lit(1)).as("n"),
        expr("count_if(event_type = 'purchase')").as("n_purch"),
        round(sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(0.0).cast("decimal(18,6)")), 2).cast("double").as("purch_rev"),
        (floor(sum(col("value").cast("decimal(18,6)")).cast("double")
          / count(lit(1)) * lit(10000.0)) / lit(10000.0)).as("avg_v"))
      .orderBy(col("d"))

  /** Cohort retention: users bucketed by first-seen day; how many are
    * active again 1 and 7 days later. Two shuffles (per-user min, then
    * per-cohort distinct counts) — no self-join on the raw events. */
  private def ev05Retention(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val cohort = e.groupBy(col("user_id")).agg(min(col("d")).as("cohort_d"))
    e.join(cohort, "user_id")
      .groupBy(col("cohort_d"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(datediff(col("d"), col("cohort_d")) === 1, col("user_id"))).as("d1"),
        countDistinct(when(datediff(col("d"), col("cohort_d")) === 7, col("user_id"))).as("d7"))
      .orderBy(col("cohort_d"))
  }

  /** Batch analog of streaming dropDuplicates: keep the first event per
    * (user, type, minute) by (ts, event_id), then count per type. */
  private def ev06EventDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col("user_id"), col("event_type"), date_trunc("minute", col("ts")))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"))
      .join(
        Tables.events(s, dir).groupBy(col("event_type")).agg(count(lit(1)).as("n_total")),
        "event_type")
      .select(col("event_type"), col("n_total"), col("n_kept"),
        (col("n_total") - col("n_kept")).as("n_dropped"))
      .orderBy(col("event_type"))
  }

  /** AS-OF join — an operator Spark has no built-in for (SURVEY brief's
    * custom-operator list). Composed the scale-correct way (preference (a):
    * existing ops): union probe marks with events, ONE shuffle+sort per
    * user, and `last(_, ignoreNulls)` over an unbounded-preceding frame
    * carries the most recent event forward into each mark. No range
    * explosion, no per-row subquery — O(n log n) per key at any scale.
    * Oracle: DuckDB's native ASOF LEFT JOIN (`e.ts <= qts`; events sort
    * before equal-ts marks via the is_mark key, matching the inclusive
    * bound). */
  private def ev07AsofJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), lit(0).as("is_mark"),
        col("ts").as("ev_ts"), col("value").as("ev_val"))
    val marks = Tables.events(s, dir).select(col("user_id")).distinct()
      .select(col("user_id"), explode(sequence(lit(0), lit(23))).as("h"))
      .select(col("user_id"),
        expr("timestampadd(HOUR, h, TIMESTAMP'2024-01-01 00:00:00')").as("ts"),
        lit(1).as("is_mark"),
        lit(null).cast("timestamp").as("ev_ts"),
        lit(null).cast("double").as("ev_val"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_mark"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.unionByName(marks)
      .withColumn("asof_ts", last(col("ev_ts"), ignoreNulls = true).over(w))
      .withColumn("asof_val", round(last(col("ev_val"), ignoreNulls = true).over(w), 2))
      .filter(col("is_mark") === 1)
      .select(col("user_id"), col("ts").as("qts"), col("asof_ts"), col("asof_val"))
      .orderBy(col("user_id"), col("qts"))
  }

  /** Range (interval-containment) join — the second custom-operator shape
    * from the brief. The naive form is a non-equi nested-loop join; the
    * scale path composes it as a BUCKETED EQUI-JOIN: intervals (per-user
    * sessions) explode into the hour buckets they span (sessions are
    * minutes long → 1–2 buckets each), probes hash-join on
    * (user, bucket), and the exact range predicate refines. Shuffle-based,
    * linear, skew-free — vs BroadcastNestedLoopJoin which cannot scale
    * past a broadcastable interval side. */
  private def ev08RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val sess = Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "5 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("sw.start").as("st"), col("sw.end").as("en"))
    val exploded = sess.select(
      col("user_id"), col("st"), col("en"),
      explode(expr(
        "sequence(unix_micros(st) div 3600000000, (unix_micros(en) - 1) div 3600000000)")).as("hb"))
    val marks = Tables.events(s, dir).select(col("user_id")).distinct()
      .select(col("user_id"), explode(sequence(lit(0), lit(23))).as("h"))
      .select(col("user_id"),
        expr("timestampadd(HOUR, h, TIMESTAMP'2024-01-01 00:00:00')").as("qts"))
      .withColumn("hb", expr("unix_micros(qts) div 3600000000"))
    marks
      .join(exploded,
        marks("user_id") === exploded("user_id") && marks("hb") === exploded("hb")
          && col("st") <= col("qts") && col("qts") < col("en"),
        "left")
      .groupBy(marks("user_id").as("user_id"), col("qts"))
      .agg(count(col("st")).as("in_sess"), min(col("st")).as("sess_start"))
      .orderBy(col("user_id"), col("qts"))
  }

  /** Gaps-and-islands: per-user streaks of CONSECUTIVE active days. Spark
    * side uses the anchor idiom (day minus per-user row_number is constant
    * within an island); the oracle detects island starts with lag()+running
    * sum — a different mechanism, so the two sides stay independent. */
  private def ev09Streaks(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    Tables.events(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("d"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .withColumn("anchor", date_sub(col("d"), col("rn")))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(
        max(col("len")).as("max_streak"),
        count(lit(1)).as("n_islands"),
        sum(col("len")).as("active_days"))
      .orderBy(col("user_id"))
  }

  /** Ordered funnel analysis (view → click → purchase): per user, each
    * stage's timestamp is the EARLIEST event of that type strictly after
    * the previous stage — three chained min-aggregates, each joined back
    * to the (pruned) event scan; the final count per stage is the classic
    * conversion funnel. Timestamps are micro-truncated per the ns rule;
    * strictly-after comparisons happen on the truncated values on both
    * engines, so boundary ties resolve identically. */
  private def ev10Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        date_trunc("microsecond", col("ts")).as("ts"))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = e.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    s1.agg(count(lit(1)).as("n_view"))
      .crossJoin(s2.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(s3.agg(count(lit(1)).as("n_view_click_purchase")))
  }

  val oracleSql: Map[String, String] = Map(
    "ev10_funnel" -> """
      WITH e AS (
        SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts FROM events),
      s1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
             WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, min(ts) AS t3 FROM e JOIN s2 ON e.user_id = s2.user_id
             WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
      SELECT (SELECT count(*) FROM s1) AS n_view,
             (SELECT count(*) FROM s2) AS n_view_click,
             (SELECT count(*) FROM s3) AS n_view_click_purchase""",
    "ev09_streaks" -> """
      WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
      flagged AS (
        SELECT user_id, d,
               CASE WHEN lag(d) OVER w IS NULL OR d <> lag(d) OVER w + INTERVAL 1 DAY
                    THEN 1 ELSE 0 END AS new_island
        FROM days WINDOW w AS (PARTITION BY user_id ORDER BY d)),
      islands AS (
        SELECT user_id, d,
               sum(new_island) OVER (PARTITION BY user_id ORDER BY d
                                     ROWS UNBOUNDED PRECEDING) AS iid
        FROM flagged),
      sized AS (SELECT user_id, iid, count(*) AS len FROM islands GROUP BY user_id, iid)
      SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak,
             count(*) AS n_islands, CAST(sum(len) AS BIGINT) AS active_days
      FROM sized GROUP BY user_id ORDER BY user_id""",
    "ev08_range_join" -> """
      WITH e AS (
        SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts FROM events),
      flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      numbered AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged),
      sess AS (
        SELECT user_id, min(ts) AS st, max(ts) + INTERVAL 5 MINUTE AS en
        FROM numbered GROUP BY user_id, sid),
      marks AS (
        SELECT u.user_id, (TIMESTAMP '2024-01-01 00:00:00' + to_hours(h.h)) AS qts
        FROM (SELECT DISTINCT user_id FROM events) u, generate_series(0, 23) h(h))
      SELECT m.user_id, m.qts, count(s.st) AS in_sess, min(s.st) AS sess_start
      FROM marks m LEFT JOIN sess s
        ON s.user_id = m.user_id AND s.st <= m.qts AND m.qts < s.en
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "ev07_asof_join" -> """
      WITH e AS (SELECT user_id, date_trunc('microseconds', ts) AS ts, value FROM events),
      marks AS (SELECT u.user_id, (TIMESTAMP '2024-01-01 00:00:00' + to_hours(h.h)) AS qts
                FROM (SELECT DISTINCT user_id FROM events) u, generate_series(0, 23) h(h))
      SELECT m.user_id, m.qts, e.ts AS asof_ts, round(e.value, 2) AS asof_val
      FROM marks m ASOF LEFT JOIN e
        ON m.user_id = e.user_id AND e.ts <= m.qts
      ORDER BY m.user_id, m.qts""",
    "ev05_retention" -> """
      WITH e AS (SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS d FROM events),
      cohort AS (SELECT user_id, min(d) AS cohort_d FROM e GROUP BY user_id)
      SELECT cohort_d,
             count(DISTINCT e.user_id) AS n_users,
             count(DISTINCT CASE WHEN date_diff('day', cohort_d, d) = 1 THEN e.user_id END) AS d1,
             count(DISTINCT CASE WHEN date_diff('day', cohort_d, d) = 7 THEN e.user_id END) AS d7
      FROM e JOIN cohort ON e.user_id = cohort.user_id
      GROUP BY cohort_d ORDER BY cohort_d""",
    "ev06_event_dedup" -> """
      WITH ranked AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY user_id, event_type,
                                  date_trunc('minute', ts)
                                  ORDER BY date_trunc('microseconds', ts), event_id) AS rn
        FROM events),
      kept AS (SELECT event_type, count(*) AS n_kept FROM ranked WHERE rn = 1 GROUP BY event_type),
      total AS (SELECT event_type, count(*) AS n_total FROM events GROUP BY event_type)
      SELECT total.event_type AS event_type, n_total, n_kept, n_total - n_kept AS n_dropped
      FROM total JOIN kept ON total.event_type = kept.event_type
      ORDER BY event_type""",
    "ev01_tumbling" -> """
      SELECT time_bucket(INTERVAL '1 hour', ts)::TIMESTAMP AS w_start, event_type,
             count(*) AS n,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv
      FROM events
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "ev02_sliding" -> """
      SELECT w_start, count(*) AS n, count(DISTINCT user_id) AS dau,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv
      FROM (SELECT (time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL 30 MINUTE)::TIMESTAMP AS w_start,
                   user_id, value
            FROM events, (VALUES (0), (1)) g(k))
      GROUP BY w_start ORDER BY w_start""",
    "ev03_session" -> """
      WITH e AS (
        SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts FROM events),
      flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      numbered AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged),
      sess AS (
        SELECT user_id, sid, count(*) AS n,
               epoch_us(max(ts)) - epoch_us(min(ts)) + 300000000 AS dur_us
        FROM numbered GROUP BY 1, 2)
      SELECT user_id, count(*) AS n_sessions,
             CAST(sum(n) AS BIGINT) AS n_events, max(n) AS max_n,
             CAST(sum(dur_us) AS BIGINT) AS dur_us
      FROM sess GROUP BY user_id ORDER BY user_id""",
    "ev04_daily" -> """
      SELECT date_trunc('day', ts)::DATE AS d,
             count(DISTINCT user_id) AS dau, count(*) AS n,
             CAST(count_if(event_type = 'purchase') AS BIGINT) AS n_purch,
             CAST(round(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END
                                 AS DECIMAL(18,6))), 2) AS DOUBLE) AS purch_rev,
             floor(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(*) * 10000.0) / 10000.0 AS avg_v
      FROM events
      GROUP BY 1 ORDER BY 1""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev01_tumbling" -> ev01Tumbling,
    "ev02_sliding" -> ev02Sliding,
    "ev03_session" -> ev03Session,
    "ev04_daily" -> ev04Daily,
    "ev05_retention" -> ev05Retention,
    "ev06_event_dedup" -> ev06EventDedup,
    "ev07_asof_join" -> ev07AsofJoin,
    "ev08_range_join" -> ev08RangeJoin,
    "ev09_streaks" -> ev09Streaks,
    "ev10_funnel" -> ev10Funnel)
}
