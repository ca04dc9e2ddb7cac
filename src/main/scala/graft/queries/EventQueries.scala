package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Num
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream analytics over `events` (batch forms; the streaming
  * runtime versions live in graft.streaming and are asserted
  * batch-equivalent in StreamingSpec). */
object EventQueries {

  /** JSON extraction from the props column (SURVEY §7: events.props is
    * extension surface; Spark get_json_object ↔ DuckDB
    * json_extract_string). */
  val jsonExtract = QueryDef(
    "q_json_extract",
    Some("""SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
            FROM events ORDER BY event_id"""),
    (s, d) => Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
      .orderBy("event_id"))

  /** Tumbling-hour windowed aggregation (batch form of the streaming
    * windowed count/sum). */
  val eventWindow = QueryDef(
    "q_event_window",
    Some(s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
                    CAST(COUNT(*) AS BIGINT) AS n_events,
                    ${Num.qroundSql("SUM(value)", 4)} AS sum_value
             FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"""),
    (s, d) => Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Num.qround(sum("value"), 4).as("sum_value"))
      .orderBy("hour_start", "event_type"))

  /** The STREAMING twin of q_event_window, under the driver's hash
    * check: the events parquet is staged behind a drop-folder, read
    * with `readStream`, aggregated through the watermarked
    * tumbling-window plan (streaming/EventStream.windowedAgg), run to
    * completion with `Trigger.AvailableNow` into a memory sink — and
    * the oracle is the BATCH query's SQL verbatim, so a green row IS
    * stream/batch parity (not just a ScalaTest assertion). Bounded
    * replay arrives as one file → one micro-batch, so the watermark
    * drops nothing and complete-mode output covers every window. */
  val streamWindow = QueryDef(
    "q_stream_window",
    Some(s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
                    CAST(COUNT(*) AS BIGINT) AS n_events,
                    ${Num.qroundSql("SUM(value)", 4)} AS sum_value
             FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"""),
    (s, d) => {
      import graft.streaming.EventStream
      val src = EventStream.stageDir(s"$d/events.parquet")
      val agg = EventStream.windowedAgg(EventStream.readEvents(s, src))
      EventStream.runAvailableNow(s, agg, "q_stream_window_sink")
        .select(col("hour_start"), col("event_type"), col("n_events"),
          Num.qround(col("sum_value"), 4).as("sum_value"))
        .orderBy("hour_start", "event_type")
    })

  /** Event-rate anomaly detection (X88 — the per-stream z-score
    * monitor an event pipeline runs over its own volume: "which hours
    * saw a count more than 3σ from this event type's norm?" — the
    * drop/spike alarm next to the X58 content-drift monitors). Hourly
    * per-type counts, then per-type μ/σ derived from EXACT integer
    * sums (Σc, Σc² as BIGINTs — the X85 device), so the single
    * μ/σ/z expression trees are bit-identical cross-engine and the
    * z-scores hash RAW (the X60 unrounded precedent); a
    * constant-rate type has σ = 0 → NULL z, anomaly false.
    * Scale shape: one keyed aggregate to hours, one bounded per-type
    * aggregate joined back on the type key — fixed-width rows. */
  val eventAnomaly = QueryDef(
    "q_event_anomaly",
    Some("""WITH h AS (
              SELECT date_trunc('hour', ts) AS hour_start, event_type,
                     CAST(COUNT(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2),
            st AS (
              SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(c) AS BIGINT) AS s,
                     CAST(SUM(c * c) AS BIGINT) AS sq
              FROM h GROUP BY 1),
            z AS (
              SELECT h.hour_start, h.event_type, h.c,
                     (CAST(h.c AS DOUBLE) - CAST(st.s AS DOUBLE)
                       / CAST(st.n AS DOUBLE)) /
                       NULLIF(sqrt((CAST(st.sq AS DOUBLE)
                         - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE)
                           / CAST(st.n AS DOUBLE))
                         / CAST(st.n AS DOUBLE)), 0.0) AS z
              FROM h JOIN st USING (event_type))
            SELECT hour_start, event_type, c AS n_events, z,
                   COALESCE(abs(z) > 3.0, FALSE) AS is_anomaly
            FROM z ORDER BY hour_start, event_type"""),
    (s, d) => {
      val h = Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("c"))
      val st = h.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("c").as("s"),
          sum(col("c") * col("c")).as("sq"))
      val mu = col("s").cast("double") / col("n").cast("double")
      val sigma = sqrt((col("sq").cast("double") -
        col("s").cast("double") * col("s").cast("double") /
          col("n").cast("double")) / col("n").cast("double"))
      val z = (col("c").cast("double") - mu) /
        nullif(sigma, lit(0.0))
      h.join(st, "event_type")
        .select(col("hour_start"), col("event_type"),
          col("c").as("n_events"), z.as("z"),
          coalesce(abs(z) > 3.0, lit(false)).as("is_anomaly"))
        .orderBy("hour_start", "event_type")
    })

  /** Sliding-window aggregation: 1-hour windows every 15 minutes —
    * each event lands in exactly 4 windows. Spark's window() aligns
    * slide boundaries to the epoch; the oracle reproduces the same
    * window starts via integer floor on epoch microseconds cross-
    * joined with the 4 slide offsets. */
  val slidingWindow = QueryDef(
    "q_sliding_window",
    // floor-mod ((e % d) + d) % d, not '//': DuckDB's integer division
    // truncates toward zero, which would misalign pre-1970 timestamps
    // (Spark's window() floors)
    Some(s"""SELECT make_timestamp(epoch_us(ts)
                      - ((epoch_us(ts) % 900000000) + 900000000) % 900000000
                      - CAST(k.k AS BIGINT) * 900000000) AS window_start,
                    event_type,
                    CAST(COUNT(*) AS BIGINT) AS n_events,
                    ${Num.qroundSql("SUM(value)", 4)} AS sum_value
             FROM events
             CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
             GROUP BY 1, 2 ORDER BY window_start, event_type"""),
    (s, d) => Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Num.qround(sum("value"), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type"))

  /** Shared by q_sessionize and its streaming twin q_stream_session —
    * one oracle text, so batch and stream are checked against the
    * SAME definition. */
  private val sessionizeSql = """WITH g AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN epoch_us(ts) -
                          LAG(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                          > 1800000000 THEN 1
                          WHEN LAG(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL THEN 1
                          ELSE 0 END AS new_session
              FROM events)
            SELECT event_id, user_id,
                   CAST(SUM(new_session) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS session_id
            FROM g ORDER BY event_id"""

  /** Sessionization: per-user session ids via 30-minute inactivity
    * gaps — lag + running sum of session-start flags (exact microsecond
    * arithmetic on both engines: unix_micros ↔ epoch_us). */
  val sessionize = QueryDef(
    "q_sessionize",
    Some(sessionizeSql),
    (s, d) => {
      val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val withFlag = Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(order))
        .withColumn("new_session",
          when(unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1)
            .when(col("prev_us").isNull, 1)
            .otherwise(0))
      withFlag
        .withColumn("session_id",
          sum("new_session").over(order.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)).cast("long"))
        .select("event_id", "user_id", "session_id")
        .orderBy("event_id")
    })

  /** The STATEFUL streaming twin of q_sessionize under the driver's
    * hash check: `flatMapGroupsWithState` carries one (lastTs,
    * sessionId) pair per user; bounded replay through
    * Trigger.AvailableNow arrives in order, so the emitted session ids
    * equal the batch windowed form — and the oracle IS the batch
    * query's SQL (sessionizeSql, shared text). This puts the custom-
    * state path (not just built-in windowed aggs) under CORRECTNESS. */
  val streamSession = QueryDef(
    "q_stream_session",
    Some(sessionizeSql),
    (s, d) => {
      import graft.streaming.EventStream
      val src = EventStream.stageDir(s"$d/events.parquet")
      EventStream.runAvailableNow(s,
          EventStream.sessionizeStream(EventStream.readEvents(s, src)),
          "q_stream_session_sink", outputMode = "append")
        .orderBy("event_id")
    })

  /** Native session-window streaming aggregation (X151 — the built-in
    * merging-window operator next to the custom-state twin
    * q_stream_session: windows MERGE as events arrive, end = last
    * event + gap, and append mode emits exactly the sessions the
    * watermark has closed). The oracle replays the gap-session device
    * (sessionizeSql's lag/cumsum) aggregated per session, then keeps
    * sessions with `end ≤ max(ts) − lateness` — the probed eviction
    * boundary (equality INCLUDED; pinned in StreamingSpec with an
    * exact end==watermark fixture). Sessions still open at bounded-
    * replay end are asserted ABSENT by the same hash (the X145
    * discipline). */
  val streamSessionWindow = QueryDef(
    "q_stream_session_window",
    Some("""WITH g AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN epoch_us(ts) -
                          LAG(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                          > 1800000000 THEN 1
                          WHEN LAG(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL THEN 1
                          ELSE 0 END AS new_session
              FROM events),
            s AS (
              SELECT user_id, ts,
                     SUM(new_session) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS sid
              FROM g),
            agg AS (
              SELECT user_id, sid,
                     MIN(ts) AS session_start,
                     MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                     CAST(COUNT(*) AS BIGINT) AS n_events
              FROM s GROUP BY 1, 2),
            wm AS (SELECT MAX(epoch_us(ts)) - 7200000000 AS w
                   FROM events)
            SELECT user_id, session_start, session_end, n_events
            FROM agg CROSS JOIN wm
            WHERE epoch_us(session_end) <= wm.w
            ORDER BY user_id, session_start"""),
    (s, d) => {
      import graft.streaming.EventStream
      val src = EventStream.stageDir(s"$d/events.parquet")
      val agg = EventStream.sessionWindowAgg(
        EventStream.readEvents(s, src))
      EventStream.runAvailableNow(s, agg, "q_stream_swin_sink",
          outputMode = "append", statePartitions = 8)
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start")
    })

  /** Stream-static enrichment join (X166 — the third streaming join
    * class next to stream-stream X43/X145: every event enriched from
    * a bounded dimension, here the customer's market segment keyed by
    * user_id; see [[graft.streaming.EventStream.enrichStream]]). No
    * state, no watermark — the static side re-plans per micro-batch;
    * LEFT join surfaces dimension-miss rows as NULL segment instead
    * of dropping them. Bounded replay trivially equals the batch
    * join, which is the oracle. */
  val streamEnrich = QueryDef(
    "q_stream_enrich",
    Some("""SELECT e.event_id, e.user_id, c.c_mktsegment AS segment,
                   e.value
            FROM events e LEFT JOIN customer c
              ON e.user_id = c.c_custkey
            ORDER BY e.event_id"""),
    (s, d) => {
      import graft.streaming.EventStream
      val src = EventStream.stageDir(s"$d/events.parquet")
      val enriched = EventStream.enrichStream(
        EventStream.readEvents(s, src),
        Tables.customer(s, d).select(col("c_custkey"),
          col("c_mktsegment").as("segment")),
        "user_id", "c_custkey", Seq("segment"))
      EventStream.runAvailableNow(s, enriched, "q_stream_enrich_sink",
          outputMode = "append")
        .select("event_id", "user_id", "segment", "value")
        .orderBy("event_id")
    })

  /** Stream-stream FULL OUTER interval join (X165 — completes the
    * outer family begun by X145: BOTH sides' unmatched rows null-pad
    * at their own watermark-driven eviction points). The oracle is
    * the two eviction contracts in batch SQL: inner pairs UNION ALL
    * anti-joined clicks with `l_ts + 60min < W` UNION ALL anti-joined
    * purchases with `r_ts < W` (a purchase's candidates satisfy
    * `l_ts < r_ts`, so once `W > r_ts` every future candidate is
    * late — probed); W = least of the two sides' max(ts) − 2 h. Rows
    * newer than their bound are asserted ABSENT by the same hash. */
  val streamIntervalFull = QueryDef(
    "q_stream_interval_full",
    Some("""WITH l AS (
              SELECT event_id AS l_event_id, user_id, ts AS l_ts
              FROM events WHERE event_type = 'click'),
            r AS (
              SELECT event_id AS r_event_id, user_id AS r_user_id,
                     ts AS r_ts, value AS r_value
              FROM events WHERE event_type = 'purchase'),
            wm AS (
              SELECT least((SELECT MAX(epoch_us(ts)) FROM events
                            WHERE event_type = 'click'),
                           (SELECT MAX(epoch_us(ts)) FROM events
                            WHERE event_type = 'purchase'))
                     - 7200000000 AS w),
            pairs AS (
              SELECT l.l_event_id, l.user_id, r.r_event_id, r.r_value
              FROM l JOIN r ON l.user_id = r.r_user_id
               AND r.r_ts > l.l_ts
               AND r.r_ts <= l.l_ts + INTERVAL 60 MINUTE)
            SELECT l_event_id, user_id, r_event_id, r_value FROM pairs
            UNION ALL
            SELECT l.l_event_id, l.user_id,
                   CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
            FROM l CROSS JOIN wm
            WHERE NOT EXISTS (SELECT 1 FROM pairs p
                              WHERE p.l_event_id = l.l_event_id)
              AND epoch_us(l.l_ts) + 3600000000 < wm.w
            UNION ALL
            SELECT CAST(NULL AS BIGINT), r.r_user_id AS user_id,
                   r.r_event_id, r.r_value
            FROM r CROSS JOIN wm
            WHERE NOT EXISTS (SELECT 1 FROM pairs p
                              WHERE p.r_event_id = r.r_event_id)
              AND epoch_us(r.r_ts) < wm.w
            ORDER BY l_event_id, r_event_id"""),
    (s, d) => {
      import graft.streaming.EventStream
      val src = EventStream.stageDir(s"$d/events.parquet")
      val ev = EventStream.readEvents(s, src)
      val joined = EventStream.intervalJoinFullStream(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        windowMinutes = 60)
      EventStream.runAvailableNow(s, joined, "q_stream_fjoin_sink",
          outputMode = "append", statePartitions = 8)
        .orderBy("l_event_id", "r_event_id")
    })

  /** Stream-stream interval join under the driver's hash check: click
    * events joined to the same user's purchases within the following
    * hour, BOTH sides unbounded streams with event-time watermarks
    * (EventStream.intervalJoinStream — join state expires once the
    * watermark clears the interval, so state is O(window), not
    * O(stream)). Inner-join semantics make the emitted pair set
    * order-independent, so bounded replay equals the batch inequality
    * join — which is exactly what the oracle runs. State partitions
    * are pinned to 8 for the replay (two join-side stores × partition
    * count is the query's fixed cost; this stream's state is tiny —
    * at production volume the same knob sizes UP with state). */
  val streamIntervalJoin = QueryDef(
    "q_stream_interval_join",
    Some("""SELECT l.event_id AS l_event_id, l.user_id,
                   r.event_id AS r_event_id, r.value AS r_value
            FROM events l JOIN events r
              ON l.user_id = r.user_id
             AND l.event_type = 'click' AND r.event_type = 'purchase'
             AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 60 MINUTE
            ORDER BY l_event_id, r_event_id"""),
    (s, d) => {
      import graft.streaming.EventStream
      val src = EventStream.stageDir(s"$d/events.parquet")
      val ev = EventStream.readEvents(s, src)
      val joined = EventStream.intervalJoinStream(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        windowMinutes = 60)
      EventStream.runAvailableNow(s, joined, "q_stream_ijoin_sink",
          outputMode = "append", statePartitions = 8)
        .orderBy("l_event_id", "r_event_id")
    })

  /** Stream-stream LEFT OUTER interval join (X145 / VERDICT r11 #4 —
    * the missing streaming-semantics class: watermark-forced
    * null-padded emission of unmatched rows). Matches emit on
    * arrival; an unmatched click is null-emitted exactly when the
    * global watermark (min of both sides' `max(ts) − 2h` after
    * bounded replay) passes its join horizon: `l_ts + 60min <
    * watermark`. The oracle IS that contract in batch SQL — inner
    * pairs UNION ALL the anti-joined clicks old enough that the
    * watermark proved them matchless; clicks newer than `watermark −
    * 60min` are still in state when the bounded replay ends and are
    * asserted ABSENT by the same hash. StreamingSpec additionally
    * pins the two-batch dynamics (null rows appear only after the
    * watermark passes). */
  val streamIntervalOuter = QueryDef(
    "q_stream_interval_outer",
    Some("""WITH l AS (
              SELECT event_id AS l_event_id, user_id, ts AS l_ts
              FROM events WHERE event_type = 'click'),
            r AS (
              SELECT event_id AS r_event_id, user_id AS r_user_id,
                     ts AS r_ts, value AS r_value
              FROM events WHERE event_type = 'purchase'),
            wm AS (
              SELECT least((SELECT MAX(epoch_us(ts)) FROM events
                            WHERE event_type = 'click'),
                           (SELECT MAX(epoch_us(ts)) FROM events
                            WHERE event_type = 'purchase'))
                     - 7200000000 AS w),
            pairs AS (
              SELECT l.l_event_id, l.user_id, r.r_event_id, r.r_value
              FROM l JOIN r ON l.user_id = r.r_user_id
               AND r.r_ts > l.l_ts
               AND r.r_ts <= l.l_ts + INTERVAL 60 MINUTE)
            SELECT l_event_id, user_id, r_event_id, r_value FROM pairs
            UNION ALL
            SELECT l.l_event_id, l.user_id,
                   CAST(NULL AS BIGINT) AS r_event_id,
                   CAST(NULL AS DOUBLE) AS r_value
            FROM l CROSS JOIN wm
            WHERE NOT EXISTS (SELECT 1 FROM pairs p
                              WHERE p.l_event_id = l.l_event_id)
              AND epoch_us(l.l_ts) + 3600000000 < wm.w
            ORDER BY l_event_id, r_event_id"""),
    (s, d) => {
      import graft.streaming.EventStream
      val src = EventStream.stageDir(s"$d/events.parquet")
      val ev = EventStream.readEvents(s, src)
      val joined = EventStream.intervalJoinOuterStream(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        windowMinutes = 60)
      EventStream.runAvailableNow(s, joined, "q_stream_ojoin_sink",
          outputMode = "append", statePartitions = 8)
        .orderBy("l_event_id", "r_event_id")
    })

  /** Watermarked streaming dedup under the driver's hash check:
    * dropDuplicatesWithinWatermark over (user_id, event_type) — state
    * for keys older than the watermark horizon expires, bounding
    * memory by the dedup window rather than the stream's lifetime.
    * Only the KEY columns are emitted (which physical row survives a
    * within-batch tie is not part of the operator's contract), so the
    * kept set on bounded replay is exactly batch DISTINCT — the
    * oracle. */
  val streamDedup = QueryDef(
    "q_stream_dedup",
    Some("""SELECT DISTINCT user_id, event_type FROM events
            ORDER BY user_id, event_type"""),
    (s, d) => {
      import graft.streaming.EventStream
      val src = EventStream.stageDir(s"$d/events.parquet")
      val deduped = EventStream.streamingDedup(
          EventStream.readEvents(s, src), Seq("user_id", "event_type"))
        .select("user_id", "event_type")
      EventStream.runAvailableNow(s, deduped, "q_stream_dedup_sink",
          outputMode = "append")
        .orderBy("user_id", "event_type")
    })

  /** Stateful running per-user totals (complete output mode — the
    * always-current aggregate a dashboard reads): after bounded replay
    * the final state equals the batch GROUP BY, which is the oracle. */
  val streamTotals = QueryDef(
    "q_stream_totals",
    Some(s"""SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                    ${Num.qroundSql("SUM(value)", 4)} AS total_value
             FROM events GROUP BY user_id ORDER BY user_id"""),
    (s, d) => {
      import graft.streaming.EventStream
      val src = EventStream.stageDir(s"$d/events.parquet")
      val totals = EventStream.runningUserTotals(
        EventStream.readEvents(s, src))
      EventStream.runAvailableNow(s, totals, "q_stream_totals_sink")
        .select(col("user_id"), col("n_events"),
          Num.qround(col("total_value"), 4).as("total_value"))
        .orderBy("user_id")
    })

  /** Top event per user-hour — dense window ranking over two keys
    * (capability: ranking beyond the reference's row_number). */
  val topEventPerUser = QueryDef(
    "q_top_event_per_user",
    Some(s"""WITH agg AS (
               SELECT user_id, event_type,
                      CAST(COUNT(*) AS BIGINT) AS n,
                      ${Num.qroundSql("SUM(value)", 4)} AS total_value
               FROM events GROUP BY user_id, event_type)
             SELECT user_id, event_type, n, total_value
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                     ORDER BY n DESC, event_type) AS rk FROM agg) x
             WHERE rk = 1 ORDER BY user_id"""),
    (s, d) => {
      val agg = Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"),
          Num.qround(sum("value"), 4).as("total_value"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("n").desc, col("event_type"))
      agg.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select("user_id", "event_type", "n", "total_value")
        .orderBy("user_id")
    })

  /** Per-type top-3 events via the bounded [[graft.functions.TopKRows]]
    * aggregate (X35) — the same answer a row_number window gives, but
    * with a ≤ k-pair heap per (partition, key) map-side, so the
    * shuffle carries at most k pairs per partition per key instead of
    * every row (q_top_event_per_user keeps the faithful window
    * formulation; this is its 100 TB shape). (value DESC, event_id
    * ASC) is a total order, so ranks — and the exploded rows — are
    * cross-engine exact. */
  val topKAgg = QueryDef(
    "q_topk_agg",
    Some("""SELECT event_type, rk, value, event_id
            FROM (SELECT event_type, value, event_id,
                    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                      ORDER BY value DESC, event_id) AS INT) AS rk
                  FROM events) x
            WHERE rk <= 3 ORDER BY event_type, rk"""),
    (s, d) => Tables.events(s, d)
      .groupBy("event_type")
      .agg(graft.functions.TopKFunctions.topKRows(
        col("value"), col("event_id"), 3).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).cast("int").as("rk"),
        col("col.ord").as("value"), col("col.id").as("event_id"))
      .orderBy("event_type", "rk"))

  /** STREAMING top-k (X153 — the q_topk_agg heap aggregate run as
    * stateful streaming state, the "largest transactions per
    * category, always current" dashboard readout): the custom
    * [[graft.functions.TopKRows]] TypedImperativeAggregate inside a
    * streaming groupBy, complete output mode. This puts the SECOND
    * custom aggregate class (bounded ≤k heap, after X141's KMV
    * bottom-k sketch) under the streaming runtime's serialize/merge
    * state path: per micro-batch Spark round-trips the heap through
    * the state store and MERGES partials, so bounded replay ends at
    * exactly the batch answer — which is the oracle (q_topk_agg's SQL
    * verbatim). State per key is ≤ k pairs — constant at any stream
    * length. */
  val streamTopK = QueryDef(
    "q_stream_topk",
    Some("""SELECT event_type, rk, value, event_id
            FROM (SELECT event_type, value, event_id,
                    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                      ORDER BY value DESC, event_id) AS INT) AS rk
                  FROM events) x
            WHERE rk <= 3 ORDER BY event_type, rk"""),
    (s, d) => {
      import graft.streaming.EventStream
      val src = EventStream.stageDir(s"$d/events.parquet")
      val top = EventStream.readEvents(s, src)
        .groupBy("event_type")
        .agg(graft.functions.TopKFunctions.topKRows(
          col("value"), col("event_id"), 3).as("top"))
      EventStream.runAvailableNow(s, top, "q_stream_topk_sink",
          outputMode = "complete", statePartitions = 8)
        .select(col("event_type"), posexplode(col("top")))
        .select(col("event_type"), (col("pos") + 1).cast("int").as("rk"),
          col("col.ord").as("value"), col("col.id").as("event_id"))
        .orderBy("event_type", "rk")
    })

  /** Multi-touch attribution (X158 — the marketing-analytics join
    * every conversion pipeline runs: each purchase's credit split
    * LINEARLY across the user's clicks in the trailing 24 h window,
    * plus the last-touch winner; purchases with no touch keep NULL
    * credit — the "organic" bucket, not silently dropped). Scale
    * shape: contributing pairs come from the bucketized
    * [[graft.ops.RangeJoin.timeRangeJoin]] (pair volume is true
    * temporal adjacency, never per-user quadratic); per-purchase
    * rollup is one keyed aggregate with a deterministic `max_by`
    * last-touch ((ts, id) total order); zero-touch purchases rejoin
    * by left join. Credit = value/n_touch is an exact integer-fed
    * IEEE divide, hashed raw. */
  val attribution = QueryDef(
    "q_attribution",
    Some("""WITH p AS (
              SELECT event_id AS purchase_id, user_id, ts AS p_ts, value
              FROM events WHERE event_type = 'purchase'),
            c AS (
              SELECT event_id AS click_id, user_id, ts AS c_ts
              FROM events WHERE event_type = 'click'),
            t AS (
              SELECT p.purchase_id, p.user_id, p.value,
                     c.click_id, c.c_ts
              FROM p JOIN c ON p.user_id = c.user_id
               AND c.c_ts <= p.p_ts
               AND c.c_ts >= p.p_ts - INTERVAL 24 HOUR),
            n AS (
              SELECT purchase_id, CAST(COUNT(*) AS BIGINT) AS n_touch
              FROM t GROUP BY purchase_id),
            lt AS (
              SELECT purchase_id, click_id AS last_click_id
              FROM (SELECT purchase_id, click_id,
                      ROW_NUMBER() OVER (PARTITION BY purchase_id
                        ORDER BY c_ts DESC, click_id DESC) AS rn
                    FROM t) x
              WHERE rn = 1)
            SELECT p.purchase_id, p.user_id, p.value,
                   COALESCE(n.n_touch, 0) AS n_touch,
                   lt.last_click_id,
                   p.value / CAST(NULLIF(n.n_touch, 0) AS DOUBLE)
                     AS credit_per_touch
            FROM p LEFT JOIN n USING (purchase_id)
                 LEFT JOIN lt USING (purchase_id)
            ORDER BY purchase_id"""),
    (s, d) => {
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"), col("value"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id"), col("ts").as("c_ts"))
      val pairs = graft.ops.RangeJoin.timeRangeJoin(
        p, c, Seq("user_id"), "ts", "c_ts",
        lowerMicros = -24L * 3600L * 1000000L, upperMicros = 0L,
        payload = Seq("click_id", "c_ts"))
      val r = pairs.groupBy("purchase_id")
        .agg(count(lit(1)).as("n_touch"),
          max_by(col("click_id"), struct(col("c_ts"), col("click_id")))
            .as("last_click_id"))
      p.join(r, Seq("purchase_id"), "left")
        .select(col("purchase_id"), col("user_id"), col("value"),
          coalesce(col("n_touch"), lit(0L)).as("n_touch"),
          col("last_click_id"),
          (col("value") /
            nullif(col("n_touch"), lit(0L)).cast("double"))
            .as("credit_per_touch"))
        .orderBy("purchase_id")
    })

  /** STREAMING CDC latest-wins compaction (X155 — the always-current
    * state table a lakehouse keeps next to its change log; streaming
    * twin of X129's q_cdc_compact): one streaming groupBy per key
    * with `max_by` over the deterministic (ts, event_id) version
    * struct plus a version count, complete mode — constant state per
    * key (one winner row + one counter), no windows, no custom state.
    * Bounded replay ends at exactly the batch compaction — the X129
    * oracle verbatim. */
  val streamCdc = QueryDef(
    "q_stream_cdc",
    Some("""WITH v AS (
              SELECT user_id, event_id, event_type, value,
                     CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
                     CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
                       AS n_versions
              FROM events
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC))
            SELECT user_id, event_id AS last_event_id,
                   event_type AS last_type, value AS last_value,
                   n_versions
            FROM v WHERE rn = 1 ORDER BY user_id"""),
    (s, d) => {
      import graft.streaming.EventStream
      val src = EventStream.stageDir(s"$d/events.parquet")
      val compacted = EventStream.readEvents(s, src)
        .groupBy("user_id")
        .agg(max_by(
            struct(col("event_id"), col("event_type"), col("value")),
            struct(col("ts"), col("event_id"))).as("last"),
          count(lit(1)).as("n_versions"))
      EventStream.runAvailableNow(s, compacted, "q_stream_cdc_sink",
          outputMode = "complete", statePartitions = 8)
        .select(col("user_id"), col("last.event_id").as("last_event_id"),
          col("last.event_type").as("last_type"),
          col("last.value").as("last_value"), col("n_versions"))
        .orderBy("user_id")
    })

  /** As-of join: each click matched to the user's latest
    * at-or-before purchase (the point-in-time feature-join Spark has
    * no operator for — see ops.AsOf). The right side is pre-aggregated
    * to one row per (user, ts) so the match is deterministic; the
    * DuckDB oracle is a native ASOF LEFT JOIN. */
  val asofJoin = QueryDef(
    "q_asof_join",
    Some("""WITH l AS (SELECT event_id, user_id, ts, value AS click_value
                       FROM events WHERE event_type = 'click'),
                 r AS (SELECT user_id, ts, MAX(value) AS purchase_value
                       FROM events WHERE event_type = 'purchase'
                       GROUP BY user_id, ts)
            SELECT l.event_id, l.user_id, l.click_value, r.purchase_value
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND r.ts <= l.ts
            ORDER BY l.event_id"""),
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").as("click_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max("value").as("purchase_value"))
      graft.ops.AsOf.asofJoin(clicks, purchases, Seq("user_id"),
          "ts", "ts", Seq("purchase_value"))
        .select("event_id", "user_id", "click_value", "purchase_value")
        .orderBy("event_id")
    })

  /** The hot-key-resistant bucketed as-of (ops.AsOf.asofJoinBucketed,
    * 1-hour buckets) under the SAME native-ASOF oracle as q_asof_join
    * — a green row is a driver-checked proof that the two-phase
    * bucketed construction reproduces as-of semantics exactly. */
  val asofJoinBucketed = QueryDef(
    "q_asof_join_bucketed",
    Some("""WITH l AS (SELECT event_id, user_id, ts, value AS click_value
                       FROM events WHERE event_type = 'click'),
                 r AS (SELECT user_id, ts, MAX(value) AS purchase_value
                       FROM events WHERE event_type = 'purchase'
                       GROUP BY user_id, ts)
            SELECT l.event_id, l.user_id, l.click_value, r.purchase_value
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND r.ts <= l.ts
            ORDER BY l.event_id"""),
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").as("click_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max("value").as("purchase_value"))
      graft.ops.AsOf.asofJoinBucketed(clicks, purchases, Seq("user_id"),
          "ts", "ts", Seq("purchase_value"), bucketMicros = 3600000000L)
        .select("event_id", "user_id", "click_value", "purchase_value")
        .orderBy("event_id")
    })

  /** Range join: per signup, the user's activity in the following
    * hour (ops.RangeJoin — bucketized so only temporally-adjacent
    * events ever pair, vs the naive per-key-quadratic inequality
    * join). The oracle is the naive inequality LEFT JOIN, which is
    * exactly the semantics the bucketing must reproduce. */
  val rangeJoin = QueryDef(
    "q_range_join",
    Some(s"""WITH s AS (SELECT event_id, user_id, ts FROM events
                        WHERE event_type = 'signup'),
                  f AS (SELECT user_id, ts, value FROM events
                        WHERE event_type <> 'signup')
             SELECT s.event_id, s.user_id,
                    CAST(COUNT(f.ts) AS BIGINT) AS n_follow,
                    ${Num.qroundSql("SUM(f.value)", 4)} AS follow_value
             FROM s LEFT JOIN f
               ON f.user_id = s.user_id AND f.ts > s.ts
              AND f.ts <= s.ts + INTERVAL 1 HOUR
             GROUP BY s.event_id, s.user_id ORDER BY s.event_id"""),
    (s, d) => {
      val ev = Tables.events(s, d)
      val signups = ev.filter(col("event_type") === "signup")
        .select("event_id", "user_id", "ts")
      val follows = ev.filter(col("event_type") =!= "signup")
      // (ts, ts + 1h] — lower offset 1 μs makes the bound strict at
      // the engines' microsecond resolution
      val pairs = graft.ops.RangeJoin.timeRangeJoin(signups, follows,
        Seq("user_id"), "ts", "ts", 1L, 3600L * 1000 * 1000,
        Seq("value"))
      val agg = pairs.groupBy("event_id")
        .agg(count(lit(1)).as("n_follow"),
          Num.qround(sum("value"), 4).as("follow_value"))
      signups.join(agg, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          coalesce(col("n_follow"), lit(0L)).as("n_follow"),
          col("follow_value"))
        .orderBy("event_id")
    })

  /** Salted skew join on the driver-checked surface: the fact side's
    * hot keys spread over 8 salts, dim replicated per salt — result ≡
    * the plain join EXACTLY (the salt only widens the shuffle key
    * space), which is precisely what the oracle's plain join checks. */
  val skewJoin = QueryDef(
    "q_skew_join",
    Some("""WITH dim AS (SELECT user_id, CAST(COUNT(*) AS BIGINT)
                           AS user_total
                         FROM events GROUP BY user_id)
            SELECT e.event_id, e.user_id, d.user_total
            FROM events e JOIN dim d USING (user_id)
            ORDER BY e.event_id"""),
    (s, d) => {
      val ev = Tables.events(s, d).select("event_id", "user_id")
      val dim = Tables.events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("user_total"))
      graft.ops.Skew.saltedJoin(ev, dim, "user_id", "event_id", salts = 8)
        .select("event_id", "user_id", "user_total")
        .orderBy("event_id")
    })

  // Morton interleave of the two 4-bit bins as a SQL sum of
  // shift/mask terms — the exact arithmetic the ZValue kernel runs
  private val zTermsSql: String = (0 until 4).flatMap(i => Seq(
    s"(((ub >> $i) & 1) << ${2 * i})",
    s"(((eb >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")

  /** Z-order layout stats (ops.Layout): both dims binned to 16 dense
    * ranks from their global bounds, Morton-interleaved into a z-key;
    * per-bucket min/max extents are the data-skipping evidence (each
    * bucket bounds BOTH user_id and event_id — what file-level pruning
    * relies on after a z-sorted write). Bit arithmetic + one IEEE
    * divide per bin: the full layout is oracle-exact. */
  val zorderStats = QueryDef(
    "q_zorder_stats",
    Some(s"""WITH b AS (
               SELECT MIN(user_id) AS ulo, MAX(user_id) AS uhi,
                      MIN(event_id) AS elo, MAX(event_id) AS ehi
               FROM events),
             z AS (
               SELECT user_id, event_id,
                      CAST(FLOOR((user_id - ulo) * 16 /
                        CAST(uhi - ulo + 1 AS DOUBLE)) AS BIGINT) AS ub,
                      CAST(FLOOR((event_id - elo) * 16 /
                        CAST(ehi - elo + 1 AS DOUBLE)) AS BIGINT) AS eb
               FROM events, b),
             zz AS (
               SELECT user_id, event_id, $zTermsSql AS zbucket FROM z)
             SELECT zbucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
                    MIN(user_id) AS a_min, MAX(user_id) AS a_max,
                    MIN(event_id) AS b_min, MAX(event_id) AS b_max
             FROM zz GROUP BY zbucket ORDER BY zbucket"""),
    (s, d) => graft.ops.Layout.zorderStats(Tables.events(s, d),
        "user_id", "event_id", bits = 4)
      .orderBy("zbucket"))

  /** One xy2d Hilbert level as oracle CTEs: rx/ry extracted, the
    * level's contribution added, then the flip+swap quadrant rotation
    * — state columns (hx, hy, hd) thread level to level, the exact
    * arithmetic [[graft.ops.Layout.hilbertKey]] unrolls. */
  private def hilbertStepSql(k: Int, s: Long): String = {
    val p = k - 1
    s"""hr$k AS (
               SELECT *,
                      CASE WHEN (hx$p & $s) > 0 THEN 1 ELSE 0 END AS rx,
                      CASE WHEN (hy$p & $s) > 0 THEN 1 ELSE 0 END AS ry
               FROM hs$p),
             hs$k AS (
               SELECT user_id, event_id,
                      hd$p + $s * $s * xor(3 * rx, ry) AS hd$k,
                      CASE WHEN ry = 0 THEN
                        (CASE WHEN rx = 1 THEN $s - 1 - hy$p
                              ELSE hy$p END)
                        ELSE hx$p END AS hx$k,
                      CASE WHEN ry = 0 THEN
                        (CASE WHEN rx = 1 THEN $s - 1 - hx$p
                              ELSE hx$p END)
                        ELSE hy$p END AS hy$k
               FROM hr$k)"""
  }

  /** Hilbert-curve layout stats (X187 — see
    * [[graft.ops.Layout.hilbertKey]]: the locality-better sibling of
    * X30's Z-order — consecutive Hilbert indices are always
    * Manhattan-adjacent cells, no quadrant-seam jumps, so range scans
    * touch fewer files; same 16×16 binning and per-bucket extents as
    * q_zorder_stats, so the two layouts read side by side). The xy2d
    * transform unrolls per bit level on BOTH engines (pure integer
    * CASE arithmetic — the SQL threads (hx, hy, hd) state columns
    * through four level CTEs); everything hashes integer-exact. */
  val hilbertStats = QueryDef(
    "q_hilbert_stats", {
      val steps = (1 to 4).map(k => hilbertStepSql(k, 1L << (4 - k)))
        .mkString(",\n             ")
      Some(s"""WITH b AS (
               SELECT MIN(user_id) AS ulo, MAX(user_id) AS uhi,
                      MIN(event_id) AS elo, MAX(event_id) AS ehi
               FROM events),
             hs0 AS (
               SELECT user_id, event_id,
                      CAST(FLOOR((user_id - ulo) * 16 /
                        CAST(uhi - ulo + 1 AS DOUBLE)) AS BIGINT) AS hx0,
                      CAST(FLOOR((event_id - elo) * 16 /
                        CAST(ehi - elo + 1 AS DOUBLE)) AS BIGINT) AS hy0,
                      CAST(0 AS BIGINT) AS hd0
               FROM events, b),
             $steps
             SELECT hd4 AS hbucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
                    MIN(user_id) AS a_min, MAX(user_id) AS a_max,
                    MIN(event_id) AS b_min, MAX(event_id) AS b_max
             FROM hs4 GROUP BY hd4 ORDER BY hbucket""")
    },
    (s, d) => graft.ops.Layout.hilbertStats(Tables.events(s, d),
        "user_id", "event_id", bits = 4)
      .orderBy("hbucket"))

  // ----------------------------------- X95 ordered conversion funnel

  /** Ordered conversion funnel (X95 — the product-analytics staple
    * next to the X9 sessionizer: how many users progressed
    * view → click → purchase IN ORDER? A click before any view does
    * not count — order is the whole point of a funnel, and what a
    * plain per-type distinct-user count gets wrong). Stage k's entry
    * time is the user's FIRST qualifying event at-or-after the stage
    * k−1 entry time, computed as three keyed (user) aggregates each
    * joined back on the user key — fixed-width rows, no window, no
    * collect_list of events. The 3-row summary pivots out of one
    * 1-row frame via stack; conversion ratios are elementwise IEEE
    * divides over exact integer counts (hash raw, the X60
    * precedent). */
  val eventFunnel = QueryDef(
    "q_event_funnel",
    Some("""WITH s1 AS (
              SELECT user_id, MIN(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (
              SELECT e.user_id, MIN(e.ts) AS t2
              FROM events e JOIN s1 ON e.user_id = s1.user_id
              WHERE e.event_type = 'click' AND e.ts >= s1.t1
              GROUP BY e.user_id),
            s3 AS (
              SELECT e.user_id, MIN(e.ts) AS t3
              FROM events e JOIN s2 ON e.user_id = s2.user_id
              WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
              GROUP BY e.user_id),
            n AS (
              SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
                     (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2,
                     (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n3)
            SELECT stage, stage_name, n_users,
                   CAST(n_users AS DOUBLE) / CAST(prev AS DOUBLE)
                     AS conv_from_prev,
                   CAST(n_users AS DOUBLE) / CAST(n1 AS DOUBLE)
                     AS conv_from_first
            FROM (
              SELECT 1 AS stage, 'view' AS stage_name, n1 AS n_users,
                     n1 AS prev, n1 FROM n
              UNION ALL
              SELECT 2, 'click', n2, n1, n1 FROM n
              UNION ALL
              SELECT 3, 'purchase', n3, n2, n1 FROM n)
            ORDER BY stage"""),
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val s1 = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = ev.join(s1, "user_id")
        .where(col("event_type") === "click" && col("ts") >= col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val s3 = ev.join(s2, "user_id")
        .where(col("event_type") === "purchase" && col("ts") >= col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      // per-stage counts are bounded 1-row driver actions at plan
      // build (the X38/BM25 corpus-stats device) — attaching them as
      // 1-row frames on a constant key folds into the banned
      // BroadcastNestedLoopJoin (lit keys AND attr·0 keys both
      // constant-fold), and the whole output is 3 scalar rows anyway
      funnelSummary(s, Seq(
        ("view", s1.count()), ("click", s2.count()),
        ("purchase", s3.count())))
    })

  /** The 3-row funnel summary from the collected per-stage counts —
    * shared by the batch and streaming funnels so their output
    * construction cannot drift. */
  private def funnelSummary(s: org.apache.spark.sql.SparkSession,
      stages: Seq[(String, Long)]): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val first = stages.head._2
    val rows = stages.zipWithIndex.map { case ((name, n), i) =>
      val prev = if (i == 0) first else stages(i - 1)._2
      (i + 1, name, n, prev, first)
    }
    rows.toDF("stage", "stage_name", "n_users", "prev", "first")
      .select(col("stage"), col("stage_name"), col("n_users"),
        (col("n_users").cast("double") / col("prev").cast("double"))
          .as("conv_from_prev"),
        (col("n_users").cast("double") / col("first").cast("double"))
          .as("conv_from_first"))
      .orderBy("stage")
  }

  /** The STREAMING twin of q_event_funnel (X99 — the funnel as a
    * per-user state MACHINE: `flatMapGroupsWithState` carries one
    * (stage, entryTs) pair per user and emits append-only transition
    * rows; see [[graft.streaming.EventStream.funnelStream]]). The
    * driver's hash check replays the bounded events table through the
    * real streaming runtime (the q_stream_window device), the
    * transition rows aggregate to the identical 3-row summary, and
    * the oracle is the BATCH funnel's SQL verbatim — a green row IS
    * stream/batch funnel parity. */
  val streamFunnel = QueryDef(
    "q_stream_funnel",
    eventFunnel.oracle,
    (s, d) => {
      import graft.streaming.EventStream
      val src = EventStream.stageDir(s"$d/events.parquet")
      val tr = EventStream.runAvailableNow(s,
        EventStream.funnelStream(EventStream.readEvents(s, src),
          Seq("view", "click", "purchase")),
        "q_stream_funnel_sink", outputMode = "append",
        statePartitions = 4)
      // transition counts collected as bounded driver metadata, then
      // the shared summary builder (same device as the batch twin)
      def cnt(k: Int) = tr.where(col("stage") === k).count()
      funnelSummary(s, Seq(
        ("view", cnt(1)), ("click", cnt(2)), ("purchase", cnt(3))))
    })

  // ------------------------------------- X96 weekly retention cohorts

  /** Weekly retention cohorts (X96 — the cohort table every
    * engagement dashboard draws: users grouped by first-seen week,
    * tracked by distinct-active weeks since). Scale shape: first-seen
    * is one keyed (user) aggregate, activity is a distinct over
    * (user, week) — both fixed-width — joined on the user key, then
    * one (cohort, offset) aggregate; cohort sizes join back on the
    * cohort key. Week offsets are exact integer day arithmetic on
    * Monday-truncated dates (both engines truncate weeks to Monday);
    * retention is one elementwise divide over exact integer counts. */
  val eventRetention = QueryDef(
    "q_event_retention",
    Some("""WITH f AS (
              SELECT user_id,
                     CAST(date_trunc('week', MIN(ts)) AS DATE) AS cw
              FROM events GROUP BY user_id),
            a AS (
              SELECT DISTINCT user_id,
                     CAST(date_trunc('week', ts) AS DATE) AS wk
              FROM events),
            cs AS (
              SELECT cw, CAST(COUNT(*) AS BIGINT) AS cohort_size
              FROM f GROUP BY cw),
            r AS (
              SELECT f.cw,
                     CAST(date_diff('day', f.cw, a.wk) // 7 AS INT)
                       AS week_offset,
                     CAST(COUNT(*) AS BIGINT) AS n_active
              FROM a JOIN f USING (user_id)
              GROUP BY 1, 2)
            SELECT r.cw AS cohort_week, r.week_offset, r.n_active,
                   cs.cohort_size,
                   CAST(r.n_active AS DOUBLE) /
                     CAST(cs.cohort_size AS DOUBLE) AS retention
            FROM r JOIN cs USING (cw)
            ORDER BY cohort_week, week_offset"""),
    (s, d) => {
      val ev = Tables.events(s, d)
      val f = ev.groupBy("user_id")
        .agg(date_trunc("week", min("ts")).cast("date").as("cw"))
      val a = ev.select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk")).distinct()
      val cs = f.groupBy("cw").agg(count(lit(1)).as("cohort_size"))
      val r = a.join(f, "user_id")
        .groupBy(col("cw"),
          (datediff(col("wk"), col("cw")) / 7).cast("int")
            .as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
      r.join(cs, "cw")
        .select(col("cw").as("cohort_week"), col("week_offset"),
          col("n_active"), col("cohort_size"),
          (col("n_active").cast("double") /
            col("cohort_size").cast("double")).as("retention"))
        .orderBy("cohort_week", "week_offset")
    })

  // ------------------------------------------- X192 Shapley attribution

  private val ShapleyBits =
    Seq("click" -> 1, "view" -> 2, "signup" -> 4, "error" -> 8)

  /** Shapley-value channel attribution (X192 — Shapley 1953, the
    * game-theoretic completion of X158's heuristic splits: channel
    * j's credit = its average marginal lift across every coalition
    * order, the unique allocation satisfying efficiency/symmetry/
    * dummy; what ad-platform "data-driven attribution" computes).
    * Unit = user-day; coalition = the set of non-purchase channels
    * touched that day (4-bit mask); v(S) = observed conversion rate
    * of units touching EXACTLY S, v(∅) = 0 by the exposed-paths
    * convention (no-touch units enter the events table only when
    * they convert — the classic selection artifact; they are
    * excluded, and unobserved coalitions score 0). Scale shape: ONE
    * user-day keyed aggregate then ONE mask aggregate (≤ 2⁴ rows —
    * alphabet-bounded by the literal channel set at ANY corpus
    * scale); the 4·8-term Shapley sum runs on the driver and
    * re-enters as literals (the X190 device). v lanes are exact
    * integer ratios; coalition weights s!(3−s)!/4! are exact CASE
    * rationals over 24.0; φ takes the one qround(6) (summation
    * order). */
  val shapley = QueryDef(
    "q_shapley", {
      val maskSql = ShapleyBits.map { case (t, b) =>
        s"$b * MAX(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END)"
      }.mkString(" + ")
      val popSql = "(s0 & 1) + ((s0 >> 1) & 1) + ((s0 >> 2) & 1) + " +
        "((s0 >> 3) & 1)"
      val chRows = ShapleyBits
        .map { case (t, b) => s"('$t', $b)" }.mkString(", ")
      Some(s"""WITH g AS (
               SELECT user_id, CAST(ts AS DATE) AS d,
                      $maskSql AS mask,
                      MAX(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS conv
               FROM events GROUP BY 1, 2),
             m AS (
               SELECT mask, CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(conv) AS BIGINT) AS c
               FROM g WHERE mask > 0 GROUP BY mask),
             sub AS (SELECT CAST(unnest(range(0, 16)) AS INT) AS s),
             v AS (
               SELECT sub.s,
                      COALESCE(CAST(m.c AS DOUBLE) / CAST(m.n AS DOUBLE),
                        0.0) AS v
               FROM sub LEFT JOIN m ON m.mask = sub.s),
             ch(channel, bit) AS (VALUES $chRows),
             pr AS (
               SELECT ch.channel, ch.bit, v0.s AS s0,
                      (CASE $popSql WHEN 0 THEN 6.0 WHEN 1 THEN 2.0
                        WHEN 2 THEN 2.0 ELSE 6.0 END) / 24.0 AS w,
                      v0.v AS va, v1.v AS vb
               FROM ch
                 JOIN v v0 ON (v0.s & ch.bit) = 0
                 JOIN v v1 ON v1.s = v0.s + ch.bit),
             phi AS (
               SELECT channel,
                      ${Num.qroundSql("SUM(w * (vb - va))", 6)} AS phi
               FROM pr GROUP BY channel),
             tch AS (
               SELECT ch.channel,
                      CAST(SUM(m.n) AS BIGINT) AS n_touch,
                      CAST(SUM(m.c) AS BIGINT) AS conv_touch
               FROM ch JOIN m ON (m.mask & ch.bit) > 0
               GROUP BY ch.channel)
             SELECT phi.channel, tch.n_touch, tch.conv_touch, phi.phi
             FROM phi JOIN tch USING (channel)
             ORDER BY channel""")
    },
    (s, d) => {
      val maskC = ShapleyBits.map { case (t, b) =>
        max(when(col("event_type") === t, lit(b)).otherwise(lit(0))) * 1
      }.reduce(_ + _)
      val g = Tables.events(s, d)
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(maskC.as("mask"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
      // bounded collect: <= 2^4 coalition rows by the literal alphabet
      val m = g.filter(col("mask") > 0).groupBy("mask")
        .agg(count(lit(1)).as("n"), sum("conv").as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      val v = m.map { case (mask, n, c) =>
        mask -> c.toDouble / n.toDouble }.toMap.withDefaultValue(0.0)
      def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      val wBySize = Map(0 -> 6.0, 1 -> 2.0, 2 -> 2.0, 3 -> 6.0)
      val rows = ShapleyBits.map { case (t, bit) =>
        val phi = q6((0 until 16).filter(s0 => (s0 & bit) == 0).map {
          s0 =>
            (wBySize(Integer.bitCount(s0)) / 24.0) *
              (v(s0 + bit) - v(s0))
        }.sum)
        val nTouch = m.collect { case (mk, n, _) if (mk & bit) > 0 => n }
          .sum
        val cTouch = m.collect { case (mk, _, c) if (mk & bit) > 0 => c }
          .sum
        (t, nTouch, cTouch, phi)
      }
      import s.implicits._
      rows.toDF("channel", "n_touch", "conv_touch", "phi")
        .orderBy("channel")
    })

  // ------------------------- X221 A→B-within-window pattern matching

  private val patternOracle = Some(
    """WITH b AS (
        SELECT event_id, user_id, epoch_us(ts) AS purchase_us
        FROM events WHERE event_type = 'purchase'),
      a AS (
        SELECT user_id, epoch_us(ts) AS aus
        FROM events WHERE event_type = 'click'),
      m AS (
        SELECT b.event_id, b.user_id, b.purchase_us,
               MAX(a.aus) AS click_us
        FROM b JOIN a
          ON a.user_id = b.user_id
         AND a.aus < b.purchase_us
         AND a.aus > b.purchase_us - 1800000000
        GROUP BY b.event_id, b.user_id, b.purchase_us)
      SELECT event_id, user_id, click_us, purchase_us,
             purchase_us - click_us AS gap_us
      FROM m ORDER BY event_id""")

  /** A→B-within-window pattern match, batch form (X221 — the
    * MATCH_RECOGNIZE / CEP primitive: each purchase attributed to the
    * MOST RECENT click strictly before it and within 30 minutes; the
    * windowed, last-touch sibling of X125's unwindowed followed-by
    * support and X158's position-based attribution). Shape: both
    * sides type-filtered AT the scan, then one user-keyed equi join
    * with the time window as residual and a keyed MAX — candidate
    * fan-out is bounded by per-user clicks inside the window, never
    * the event product. Strict inequalities so same-timestamp
    * click/purchase pairs resolve identically everywhere (including
    * the streaming twin). All-integer micros lanes. */
  val patternWithin = QueryDef(
    "q_pattern_within",
    patternOracle,
    (s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"),
        col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val b = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          col("us").as("purchase_us"))
      val a = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("au"), col("us").as("aus"))
      b.join(a, col("au") === col("user_id") &&
          col("aus") < col("purchase_us") &&
          col("aus") > col("purchase_us") - 1800000000L)
        .groupBy("event_id", "user_id", "purchase_us")
        .agg(max("aus").as("click_us"))
        .select(col("event_id"), col("user_id"), col("click_us"),
          col("purchase_us"),
          (col("purchase_us") - col("click_us")).as("gap_us"))
        .orderBy("event_id")
    })

  /** The STREAMING twin of q_pattern_within (X221 — the pattern as a
    * per-user state machine: `flatMapGroupsWithState` carries ONE
    * long (the last click timestamp) per user and emits append-only
    * match rows; see [[graft.streaming.EventStream.patternStream]]).
    * Replayed through the real runtime (Trigger.AvailableNow), hashed
    * against the BATCH form's SQL verbatim — a green row IS
    * stream/batch CEP parity. */
  val streamPattern = QueryDef(
    "q_stream_pattern",
    patternOracle,
    (s, d) => {
      import graft.streaming.EventStream
      val src = EventStream.stageDir(s"$d/events.parquet")
      val matches = EventStream.runAvailableNow(s,
        EventStream.patternStream(EventStream.readEvents(s, src),
          "click", "purchase", windowMinutes = 30),
        "q_stream_pattern_sink", outputMode = "append",
        statePartitions = 4)
      matches.select(col("event_id"), col("user_id"), col("click_us"),
          col("purchase_us"),
          (col("purchase_us") - col("click_us")).as("gap_us"))
        .orderBy("event_id")
    })

  /** Second-order sequential patterns with first-order surprise
    * (X235 — PrefixSpan-lite: the top contiguous event-type TRIPLES
    * per user stream, each scored against what the X115 first-order
    * Markov chain would predict: expected(abc) = c(ab)·c(bc)/c(b·),
    * so ratio ≫ 1 marks genuinely second-order behavior a transition
    * matrix cannot see — the standard "is one hop of memory enough"
    * probe before anyone fits a bigger sequence model). Shape: two
    * leads over ONE user-keyed window (ts, event_id total order —
    * one shuffle), triple/pair counts over the bounded type³
    * alphabet, top-20 under the total order (support DESC, triple
    * ASC). Counts exact; support and the surprise ratio are
    * exact-integer-fed element-wise divides (hash raw). */
  val seqTriples = QueryDef(
    "q_seq_triples",
    Some("""WITH o AS (
             SELECT user_id, event_type, epoch_us(ts) AS us, event_id
             FROM events),
           lagged AS (
             SELECT user_id, event_type AS a,
                    lead(event_type, 1) OVER w AS b,
                    lead(event_type, 2) OVER w AS c
             FROM o
             WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
           triples AS (
             SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS n
             FROM lagged WHERE b IS NOT NULL AND c IS NOT NULL
             GROUP BY a, b, c),
           prs AS (
             SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab
             FROM lagged WHERE b IS NOT NULL
             GROUP BY a, b),
           midstart AS (
             SELECT a AS b, CAST(SUM(n_ab) AS BIGINT) AS n_bdot
             FROM prs GROUP BY a),
           tot AS (
             SELECT CAST(SUM(n) AS BIGINT) AS nt FROM triples),
           scored AS (
             SELECT t.a, t.b, t.c, t.n,
                    CAST(t.n AS DOUBLE) /
                      CAST((SELECT nt FROM tot) AS DOUBLE) AS support,
                    CAST(t.n AS DOUBLE) /
                      (CAST(p1.n_ab AS DOUBLE) *
                       CAST(p2.n_ab AS DOUBLE) /
                       CAST(m.n_bdot AS DOUBLE)) AS surprise
             FROM triples t
             JOIN prs p1 ON p1.a = t.a AND p1.b = t.b
             JOIN prs p2 ON p2.a = t.b AND p2.b = t.c
             JOIN midstart m ON m.b = t.b)
           SELECT a, b, c, n, support, surprise FROM scored
           ORDER BY n DESC, a, b, c LIMIT 20"""),
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us", "event_id")
      val lagged = Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("a"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("b", lead("a", 1).over(w))
        .withColumn("c", lead("a", 2).over(w))
        .localCheckpoint(true) // triple AND pair counts
      val triples = lagged
        .filter(col("b").isNotNull && col("c").isNotNull)
        .groupBy("a", "b", "c").agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // totals probe + the scoring join
      val prs = lagged.filter(col("b").isNotNull)
        .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
        .localCheckpoint(true) // p1/p2 joins + the mid totals
      val midstart = prs.groupBy(col("a").as("bm"))
        .agg(sum("n_ab").as("n_bdot"))
      val nt = triples.agg(sum("n")).head().getLong(0)
      triples
        .join(broadcast(prs.select(col("a").as("p1a"),
          col("b").as("p1b"), col("n_ab").as("n_ab1"))),
          col("p1a") === col("a") && col("p1b") === col("b"))
        .join(broadcast(prs.select(col("a").as("p2a"),
          col("b").as("p2b"), col("n_ab").as("n_ab2"))),
          col("p2a") === col("b") && col("p2b") === col("c"))
        .join(broadcast(midstart), col("bm") === col("b"))
        .select(col("a"), col("b"), col("c"), col("n"),
          (col("n").cast("double") / lit(nt.toDouble)).as("support"),
          (col("n").cast("double") /
            (col("n_ab1").cast("double") * col("n_ab2").cast("double") /
              col("n_bdot").cast("double"))).as("surprise"))
        .orderBy(col("n").desc, col("a"), col("b"), col("c"))
        .limit(20)
    })

  /** Multi-window SLO burn-rate alerting (X239 — the Google SRE
    * workbook's error-budget policy: page when BOTH a fast (1 h) and
    * a slow (6 h) window burn the budget faster than threshold —
    * the fast window catches the spike, the slow window stops a
    * blip from paging. "Error" = value > 400 (the synthetic SLI),
    * budget = 1%, thresholds 14.4 / 6 — the workbook's numbers).
    * Windows are integer epoch-hour keys (exact, no session-zone
    * lane); the 6 h window is the tumbling hour ÷ 6 (exact integer
    * div); rates and burn factors are exact-integer-fed divides
    * (hash raw); page is a boolean conjunction of the two lanes. */
  val sloBurn = QueryDef(
    "q_slo_burn",
    Some("""WITH e AS (
             SELECT event_type,
                    epoch_us(ts) // 3600000000 AS hr,
                    CASE WHEN value > 400.0 THEN 1 ELSE 0 END AS err
             FROM events),
           h AS (
             SELECT event_type, hr,
                    CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(err) AS BIGINT) AS n_err
             FROM e GROUP BY 1, 2),
           s AS (
             SELECT event_type, hr // 6 AS hr6,
                    CAST(SUM(n) AS BIGINT) AS n6,
                    CAST(SUM(n_err) AS BIGINT) AS n_err6
             FROM h GROUP BY 1, 2)
           SELECT h.event_type, h.hr, h.n, h.n_err,
                  CAST(h.n_err AS DOUBLE) / CAST(h.n AS DOUBLE) / 0.01
                    AS burn1,
                  CAST(s.n_err6 AS DOUBLE) / CAST(s.n6 AS DOUBLE)
                    / 0.01 AS burn6,
                  CAST(h.n_err AS DOUBLE) / CAST(h.n AS DOUBLE) / 0.01
                      > 14.4
                    AND CAST(s.n_err6 AS DOUBLE) / CAST(s.n6 AS DOUBLE)
                      / 0.01 > 6.0 AS page
           FROM h JOIN s
             ON s.event_type = h.event_type AND s.hr6 = h.hr // 6
           ORDER BY h.event_type, h.hr"""),
    (s, d) => {
      val e = Tables.events(s, d).select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hr"),
        when(col("value") > 400.0, 1L).otherwise(0L).as("err"))
      val h = e.groupBy("event_type", "hr")
        .agg(count(lit(1)).as("n"), sum("err").as("n_err"))
        .localCheckpoint(true) // the 6h rollup re-reads it
      val s6 = h.groupBy(col("event_type").as("t6"),
          expr("hr div 6").as("hr6"))
        .agg(sum("n").as("n6"), sum("n_err").as("n_err6"))
      val burn1 = col("n_err").cast("double") / col("n").cast("double") /
        0.01
      val burn6 = col("n_err6").cast("double") / col("n6").cast("double") /
        0.01
      h.join(s6, col("t6") === col("event_type") &&
          col("hr6") === expr("hr div 6"))
        .select(col("event_type"), col("hr"), col("n"), col("n_err"),
          burn1.as("burn1"), burn6.as("burn6"),
          (burn1 > 14.4 && burn6 > 6.0).as("page"))
        .orderBy("event_type", "hr")
    })

  /** Time-weighted average value per event type (X240 — the TWAP
    * device: each observation weighted by how long it REMAINED the
    * current value (till the same user's next event), vs the naive
    * mean that over-weights burst periods — the standard correction
    * for irregularly-sampled series, finance's TWAP and ops' "mean
    * gauge reading" alike). Dwell = lead(ts) − ts over ONE user-keyed
    * window (last event per user carries no dwell and drops on both
    * engines); weights are exact integer micros; the Σw·v / Σw lanes
    * are fold-order aggregates → qround(6); the naive mean rides
    * along for contrast. */
  val twap = QueryDef(
    "q_twap",
    Some(s"""WITH o AS (
             SELECT event_type, value, user_id,
                    epoch_us(ts) AS us, event_id
             FROM events),
           w AS (
             SELECT event_type, value,
                    lead(us) OVER (PARTITION BY user_id
                      ORDER BY us, event_id) - us AS dwell_us
             FROM o),
           k AS (SELECT * FROM w WHERE dwell_us IS NOT NULL)
           SELECT event_type,
                  CAST(COUNT(*) AS BIGINT) AS n_weighted,
                  ${Num.qroundSql(
                    """SUM(CAST(dwell_us AS DOUBLE) * value) /
                       SUM(CAST(dwell_us AS DOUBLE))""", 6)} AS twap,
                  ${Num.qroundSql("AVG(value)", 6)} AS naive_mean
           FROM k GROUP BY event_type
           ORDER BY event_type"""),
    (s, d) => {
      val wspec = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us", "event_id")
      val w = Tables.events(s, d)
        .select(col("event_type"), col("value"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("dwell_us", lead("us", 1).over(wspec) - col("us"))
        .filter(col("dwell_us").isNotNull)
      w.groupBy("event_type")
        .agg(count(lit(1)).as("n_weighted"),
          Num.qround(sum(col("dwell_us").cast("double") * col("value")) /
            sum(col("dwell_us").cast("double")), 6).as("twap"),
          Num.qround(avg("value"), 6).as("naive_mean"))
        .orderBy("event_type")
    })

  /** File-skipping effectiveness across physical layouts (X244 — the
    * number data layouts exist to move: given the SAME 32-file split
    * budget, how many files does min/max pruning skip for a point
    * predicate on user and a range predicate on time, under (a) a
    * time-ingest sort, (b) an entity sort, (c) a z-order interleave?
    * The quantified version of the X30/X187 layout rows' claim: the
    * sorted layouts each ace ONE predicate and fail the other, the
    * z-order prunes BOTH — per-file (min,max) extents are exactly
    * what parquet row-group / Delta file stats give a scan planner).
    * All lanes exact integers: the bin device is the X30
    * exact-numerator floor, file ids integer division of the z-key,
    * predicates integer midpoint/percent arithmetic, prune verdicts
    * interval tests on exact extents. */
  val skippingEval = QueryDef(
    "q_skipping_eval",
    Some(s"""WITH b AS (
             SELECT MIN(user_id) AS ulo, MAX(user_id) AS uhi,
                    MIN(epoch_us(ts)) AS tlo, MAX(epoch_us(ts)) AS thi
             FROM events),
           e AS (SELECT user_id AS u, epoch_us(ts) AS t FROM events),
           binned AS (
             SELECT u, t,
                    CAST(FLOOR((t - b.tlo) * 32 /
                      CAST(b.thi - b.tlo + 1 AS DOUBLE)) AS BIGINT)
                      AS f_time,
                    CAST(FLOOR((u - b.ulo) * 32 /
                      CAST(b.uhi - b.ulo + 1 AS DOUBLE)) AS BIGINT)
                      AS f_user,
                    CAST(FLOOR((u - b.ulo) * 16 /
                      CAST(b.uhi - b.ulo + 1 AS DOUBLE)) AS BIGINT)
                      AS ub,
                    CAST(FLOOR((t - b.tlo) * 16 /
                      CAST(b.thi - b.tlo + 1 AS DOUBLE)) AS BIGINT)
                      AS eb
             FROM e CROSS JOIN b),
           zz AS (
             SELECT u, t, f_time, f_user,
                    (${(0 until 4).flatMap(i => Seq(
                      s"(((ub >> $i) & 1) << ${2 * i})",
                      s"(((eb >> $i) & 1) << ${2 * i + 1})"))
                      .mkString(" + ")}) // 8 AS f_z
             FROM binned),
           files AS (
             SELECT 'time' AS layout, f_time AS f,
                    CAST(COUNT(*) AS BIGINT) AS n,
                    MIN(u) AS min_u, MAX(u) AS max_u,
                    MIN(t) AS min_t, MAX(t) AS max_t
             FROM zz GROUP BY f_time
             UNION ALL
             SELECT 'user', f_user, CAST(COUNT(*) AS BIGINT),
                    MIN(u), MAX(u), MIN(t), MAX(t)
             FROM zz GROUP BY f_user
             UNION ALL
             SELECT 'zorder', f_z, CAST(COUNT(*) AS BIGINT),
                    MIN(u), MAX(u), MIN(t), MAX(t)
             FROM zz GROUP BY f_z),
           p AS (
             SELECT (ulo + uhi) // 2 AS u0,
                    tlo + ((thi - tlo) * 45) // 100 AS t1,
                    tlo + ((thi - tlo) * 55) // 100 AS t2
             FROM b)
           SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
                  CAST(SUM(CASE WHEN p.u0 >= min_u AND p.u0 <= max_u
                    THEN 0 ELSE 1 END) AS BIGINT) AS pruned_point,
                  CAST(SUM(CASE WHEN max_t < p.t1 OR min_t > p.t2
                    THEN 1 ELSE 0 END) AS BIGINT) AS pruned_range,
                  CAST(SUM(CASE WHEN p.u0 >= min_u AND p.u0 <= max_u
                    THEN n ELSE 0 END) AS BIGINT) AS rows_scanned_point,
                  CAST(SUM(CASE WHEN max_t < p.t1 OR min_t > p.t2
                    THEN 0 ELSE n END) AS BIGINT) AS rows_scanned_range
           FROM files CROSS JOIN p
           GROUP BY layout ORDER BY layout"""),
    (s, d) => {
      import graft.ops.Layout
      val e = Tables.events(s, d)
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("t"))
        .localCheckpoint(true) // bounds action + the binned scan
      val bd = Layout.bounds(e, "u", "t")
      def bin(c: org.apache.spark.sql.Column, lo: Long, hi: Long,
          k: Int) =
        floor(((c - lit(lo)) * lit(k.toLong)).cast("double") /
          lit((hi - lo + 1).toDouble)).cast("long")
      val zz = e.select(col("u"), col("t"),
          bin(col("t"), bd.bLo, bd.bHi, 32).as("f_time"),
          bin(col("u"), bd.aLo, bd.aHi, 32).as("f_user"),
          Layout.zKey(col("u"), col("t"), bd, 4).cast("long").as("zk"))
        .withColumn("f_z", expr("zk div 8"))
      def filesOf(layout: String, fcol: String) =
        zz.groupBy(col(fcol).as("f"))
          .agg(count(lit(1)).as("n"), min("u").as("min_u"),
            max("u").as("max_u"), min("t").as("min_t"),
            max("t").as("max_t"))
          .withColumn("layout", lit(layout))
      val files = filesOf("time", "f_time")
        .union(filesOf("user", "f_user"))
        .union(filesOf("zorder", "f_z"))
      val u0 = (bd.aLo + bd.aHi) / 2
      val t1 = bd.bLo + ((bd.bHi - bd.bLo) * 45) / 100
      val t2 = bd.bLo + ((bd.bHi - bd.bLo) * 55) / 100
      val hitPoint = lit(u0) >= col("min_u") && lit(u0) <= col("max_u")
      val missRange = col("max_t") < t1 || col("min_t") > t2
      files.groupBy("layout")
        .agg(count(lit(1)).as("n_files"),
          sum(when(hitPoint, 0L).otherwise(1L)).as("pruned_point"),
          sum(when(missRange, 1L).otherwise(0L)).as("pruned_range"),
          sum(when(hitPoint, col("n")).otherwise(0L))
            .as("rows_scanned_point"),
          sum(when(missRange, 0L).otherwise(col("n")))
            .as("rows_scanned_range"))
        .orderBy("layout")
    })

  val all: Seq[QueryDef] = Seq(jsonExtract, eventWindow, streamWindow,
    eventAnomaly,
    slidingWindow, sessionize, streamSession, streamSessionWindow,
    streamIntervalJoin, streamIntervalOuter, streamIntervalFull,
    streamEnrich,
    streamTopK, streamCdc,
    attribution,
    streamDedup, streamTotals, topEventPerUser, topKAgg, asofJoin,
    asofJoinBucketed, rangeJoin, skewJoin, zorderStats, hilbertStats,
    shapley,
    eventFunnel, streamFunnel, eventRetention,
    patternWithin, streamPattern, seqTriples, sloBurn, twap,
    skippingEval)
}
