package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.{Q, Tables}
import graft.operators.AsOfJoin

/** Temporal operators beyond the reference's tumbling window
  * (SURVEY.md §2.4/§2.7 gap list): as-of join, session windows and
  * sliding windows — batch entries with DuckDB oracles; the streaming
  * variants of the same transforms are covered by StreamingSpec.
  */
object TemporalOps {

  /** As-of join: for every order, the customer's previous order and
    * the gap in days (strict backward as-of; DuckDB oracles it with a
    * native ASOF JOIN). The right side is deduped to one row per
    * (custkey, date) so the match is unique and deterministic. */
  val asofPrevOrder = Q(
    "q_asof_prev_order",
    (spark, dir) => {
      // a dateless order has no as-of semantics — excluded EXPLICITLY
      // on both engines (r16 null corpus: our AsOfJoin gives a
      // null-time row no match by design, while DuckDB's native ASOF
      // sort-matched the 312 null-date rows — engine-defined, not SQL,
      // behavior on both sides until the contract is stated)
      val o = Tables.orders(spark, dir).filter(col("o_orderdate").isNotNull)
      val right = o.groupBy(col("o_custkey").as("custkey"),
                            col("o_orderdate").as("prev_date"))
        .agg(max(col("o_orderkey")).as("prev_orderkey"))
      AsOfJoin.backward(
          o.select("o_orderkey", "o_custkey", "o_orderdate"), right,
          leftKey = "o_custkey", leftTime = "o_orderdate",
          rightKey = "custkey", rightTime = "prev_date",
          rightCols = Seq("prev_date", "prev_orderkey"),
          joinType = "inner", strict = true)
        .select(col("o_orderkey"), col("o_custkey"), col("prev_orderkey"),
                datediff(col("o_orderdate"), col("prev_date")).as("gap_days"))
    },
    Some("""
      WITH o AS (SELECT * FROM orders WHERE o_orderdate IS NOT NULL),
      d AS (SELECT o_custkey AS custkey, o_orderdate AS prev_date,
                   max(o_orderkey) AS prev_orderkey
            FROM o GROUP BY 1, 2)
      SELECT o.o_orderkey, o.o_custkey, d.prev_orderkey,
             date_diff('day', d.prev_date, o.o_orderdate) AS gap_days
      FROM o ASOF JOIN d
        ON o.o_custkey = d.custkey AND o.o_orderdate > d.prev_date
    """))

  /** Session windows: per-user sessions with a 30-minute inactivity
    * gap (Spark `session_window`; DuckDB mirrors with gaps-and-islands
    * over lag + cumulative sum). Boundary semantics: the built-in
    * MERGES two events exactly `gap` apart (inclusive boundary,
    * verified empirically — StatefulSpec's gap-boundary test), so the
    * oracle's island break is strictly-greater (`> INTERVAL`), not
    * `>=`. The `>=` this oracle carried until r10 was a latent
    * divergence the µs-precision fixture could never trip: no two
    * consecutive fixture events land exactly 30:00.000000 apart. */
  val sessionWindows = Q(
    "q_session_windows",
    (spark, dir) => {
      Tables.events(spark, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
                col("session_window.start").as("start"),
                col("session_window.end").as("end"),
                col("n_events"))
    },
    Some("""
      WITH x AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                      OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                         > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST)),
      s AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM x)
      SELECT user_id, min(ts) AS start,
             max(ts) + INTERVAL '30 minutes' AS "end",
             count(*) AS n_events
      FROM s
      GROUP BY user_id, sid
    """))

  /** Sliding windows: 10-minute windows every 5 minutes per event
    * type (each event lands in exactly two windows; DuckDB mirrors by
    * unnesting the two candidate window starts). */
  val slidingWindows = Q(
    "q_sliding_windows",
    (spark, dir) => {
      Tables.events(spark, dir)
        .groupBy(col("event_type").as("source"),
                 window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("start"), col("window.end").as("end"),
                col("source"), col("n"))
    },
    Some("""
      SELECT s AS start, s + INTERVAL '10 minutes' AS "end",
             event_type AS source, count(*) AS n
      FROM (SELECT event_type,
                   unnest([time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)),
                           time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
                             - INTERVAL '5 minutes']) AS s
            FROM events WHERE ts IS NOT NULL)
      GROUP BY 1, 2, 3
    """))

  /** Interval join via [[graft.operators.RangeJoin]]: purchases in the
    * 10 minutes preceding each error event (no equi key — the case
    * where Spark's native plan is a BroadcastNestedLoopJoin and the
    * bucketed rewrite is the scale path; PlanShapeSpec asserts no BNLJ
    * survives). Oracle = the plain theta join, which DuckDB executes
    * with its native IEJoin. */
  val rangeJoin = Q(
    "q_range_join",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("ts").as("e_ts"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("ts").as("p_ts"))
      graft.operators.RangeJoin.preceding(err, pur, "e_ts", "p_ts", 600L)
        .groupBy(col("e_id"))
        .agg(count(lit(1)).as("n_prior_purchases"))
        .select(col("e_id").as("event_id"), col("n_prior_purchases"))
    },
    Some("""
      SELECT e.event_id AS event_id, count(*) AS n_prior_purchases
      FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS e_ts FROM events
            WHERE event_type = 'error') e
      JOIN (SELECT CAST(ts AS TIMESTAMP) AS p_ts FROM events
            WHERE event_type = 'purchase') p
        ON p.p_ts >= e.e_ts - INTERVAL 10 MINUTE AND p.p_ts < e.e_ts
      GROUP BY 1
    """))

  /** Forward as-of with tolerance: for every order, the customer's
    * NEXT order, but only when it lands within 90 days — the
    * repurchase-window question (strict forward + tolerance; DuckDB
    * oracles the direction with a native `ASOF ... ON l.t < r.t` and
    * the tolerance as a post-filter, equivalent because ASOF keeps
    * only the nearest candidate). Right side deduped to one row per
    * (custkey, date) like [[asofPrevOrder]]. */
  val asofNextOrder = Q(
    "q_asof_next_order",
    (spark, dir) => {
      // dateless orders excluded explicitly — same contract as
      // [[asofPrevOrder]] (the tolerance post-filter happened to mask
      // the divergence here; stated anyway rather than incidental)
      val o = Tables.orders(spark, dir).filter(col("o_orderdate").isNotNull)
      val right = o.groupBy(col("o_custkey").as("custkey"),
                            col("o_orderdate").as("next_date"))
        .agg(max(col("o_orderkey")).as("next_orderkey"))
      AsOfJoin.forward(
          o.select("o_orderkey", "o_custkey", "o_orderdate"), right,
          leftKey = "o_custkey", leftTime = "o_orderdate",
          rightKey = "custkey", rightTime = "next_date",
          rightCols = Seq("next_date", "next_orderkey"),
          joinType = "inner", strict = true, tolerance = Some("90 days"))
        .select(col("o_orderkey"), col("o_custkey"), col("next_orderkey"),
                datediff(col("next_date"), col("o_orderdate")).as("gap_days"))
    },
    Some("""
      WITH o AS (SELECT * FROM orders WHERE o_orderdate IS NOT NULL),
      d AS (SELECT o_custkey AS custkey, o_orderdate AS next_date,
                   max(o_orderkey) AS next_orderkey
            FROM o GROUP BY 1, 2),
      -- MATERIALIZED: the tolerance filter must stay OUTSIDE the ASOF
      -- join (pushed in, it binds as a second ASOF inequality -> error)
      a AS MATERIALIZED (
        SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
               d.next_orderkey, d.next_date
        FROM o ASOF JOIN d
          ON o.o_custkey = d.custkey AND o.o_orderdate < d.next_date)
      SELECT o_orderkey, o_custkey, next_orderkey,
             date_diff('day', o_orderdate, next_date) AS gap_days
      FROM a
      WHERE next_date <= o_orderdate + INTERVAL 90 DAY
    """))

  /** Slowly-changing-dimension Type 2 build from a change stream: per
    * user, compress consecutive events with the same `event_type` into
    * one version row, then stamp each version with
    * `[valid_from, valid_to)` and `is_current` — the standard
    * warehouse history table (Kimball SCD2), derived here from the
    * events CDC feed the way an incremental dimension load would.
    * Change detection is `lag`, interval close-out is `lead` over the
    * surviving change rows, version numbers are `row_number` — all
    * three windows share ONE partitioning (`user_id`) and ONE sort
    * key (`ts, event_id`; `event_id` breaks timestamp ties
    * deterministically), so the whole build is a single shuffle and a
    * single sort, reused across the three window passes.
    *
    * 100 TB shape: one exchange on the dimension key — window
    * functions never re-shuffle when the `Window` spec matches the
    * existing partitioning — and per-key state is a single previous
    * row, so memory is O(1) per stream. The SCD2 MERGE variant (apply
    * today's delta to yesterday's dimension) is [[Relational
    * .upsertSnapshot]]'s max_by shape; this is the from-scratch
    * (re)build. */
  val scd2History = Q(
    "q_scd2_history",
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull ||
                col("prev_type") =!= col("event_type"))
        .withColumn("version", row_number().over(w))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("version"), col("event_type"),
                col("ts").as("valid_from"), col("valid_to"),
                col("valid_to").isNull.as("is_current"))
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                        event_type FROM events),
      c AS (SELECT *, lag(event_type) OVER w AS prev_type FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
      f AS (SELECT user_id, event_id, ts, event_type FROM c
            WHERE prev_type IS NULL OR prev_type <> event_type)
      SELECT user_id,
             CAST(row_number() OVER w AS INT) AS version,
             event_type, ts AS valid_from,
             lead(ts, 1) OVER w AS valid_to,
             lead(ts, 1) OVER w IS NULL AS is_current
      FROM f
      WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
    """))

  /** Gap-filled time series: the reference's windowed count view
    * (SURVEY §2.3 A1) densified onto a complete 5-minute grid — every
    * (bucket, event_type) cell between the corpus' first and last
    * bucket exists, zero-filled when no event landed there. Dashboards
    * and downstream anomaly detectors (q_error_anomaly) need the dense
    * form: a missing row and a zero-count row mean different things to
    * a chart or a diff. Buckets are epoch-second BIGINTs
    * (`epoch div 300 * 300`), the TZ-proof integer image of
    * `window(ts, "5 minutes").start`.
    *
    * 100 TB shape: ONE fact scan — the grouped count. Grid bounds and
    * the source dimension both derive from the POST-AGGREGATE frame
    * (bounded: buckets x types), never from a second raw scan; the
    * counts frame is eagerly checkpointed because one action reads it
    * three ways (bounds, sources, probe side) — the lazy-persist
    * stampede class (NOTES Gotchas). The grid crossJoin is
    * span/300 x |event types| rows, both factors bounded and
    * corpus-independent (time span, type vocabulary); final assembly
    * is a broadcast-able left join of grid onto counts. */
  val gapfill = Q(
    "q_gapfill",
    (spark, dir) => {
      val counts = Tables.events(spark, dir)
        .select(expr("(cast(ts as long) div 300) * 300").as("bucket"),
                col("event_type"))
        .groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val bounds = counts.agg(min(col("bucket")).as("lo"),
                              max(col("bucket")).as("hi"))
      val grid = bounds
        .select(explode(expr("sequence(lo, hi, 300)")).as("bucket_start"))
      val sources = counts.select(col("event_type").as("source")).distinct()
      grid.crossJoin(broadcast(sources))
        .join(counts,
              col("bucket_start") === col("bucket") &&
              col("source") === col("event_type"), "left")
        .select(col("bucket_start"), col("source"),
                coalesce(col("n"), lit(0L)).as("n"))
    },
    Some("""
      WITH c AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 300 * 300
                          AS bucket,
                        event_type, CAST(count(*) AS BIGINT) AS n
                 FROM events GROUP BY 1, 2),
      b AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM c),
      g AS (SELECT unnest(generate_series(lo, hi, 300)) AS bucket_start
            FROM b),
      s AS (SELECT DISTINCT event_type AS source FROM c)
      SELECT g.bucket_start, s.source, coalesce(c.n, 0) AS n
      FROM g CROSS JOIN s
      LEFT JOIN c ON c.bucket = g.bucket_start AND c.event_type = s.source
    """))

  /** Event-sequence transition matrix — the Markov view of the
    * clickstream: for each user's time-ordered event stream, count
    * (previous event type → this event type) transitions, with the
    * per-source-state transition probability in exact integer ppm
    * (1e6·n div row_total — integer division, no float). The natural
    * next analytics step after the reference's per-type counts
    * (v2:64-65): not just HOW MANY views, but what users do NEXT.
    *
    * 100 TB shape: lag() is partitioned by user_id — a hash-partition
    * window, no global-order reducer; transition counting is one
    * map-side-partial agg over at most |event| rows; the matrix is
    * |types|² ≤ tiny. Ties on identical timestamps break on event_id
    * so the transition sequence is total-ordered and deterministic. */
  val eventTransitions = Q(
    "q_event_transitions",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = trans.groupBy(col("from_type"))
        .agg(sum(col("n")).as("row_total"))
      trans.join(totals, "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          expr("(1000000L * n) div row_total").as("p_ppm"))
    },
    Some("""
      WITH t AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST, event_id NULLS FIRST) AS from_type,
               event_type AS to_type
        FROM events),
      trans AS (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        FROM t WHERE from_type IS NOT NULL
        GROUP BY 1, 2),
      totals AS (
        SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
        FROM trans GROUP BY 1)
      SELECT from_type, to_type, n, (1000000 * n) // row_total AS p_ppm
      FROM trans JOIN totals USING (from_type)
    """))

  /** Exponentially-weighted moving average of per-user inter-event
    * gaps (alpha = 1/2) — the smoothing primitive behind activity-decay
    * features and cadence anomaly detection: s_1 = g_1,
    * s_i = (g_i + s_{i-1}) / 2, folded over each user's time-ordered
    * gap sequence.
    *
    * Determinism contract: alpha = 1/2 makes every step an IEEE-exact
    * halving plus one correctly-rounded addition, applied in a FIXED
    * per-user array order (sorted struct collect, ties broken on
    * event_id) — both engines run the identical sequential fold, so the
    * result is bit-identical even after the dyadic denominators exceed
    * the 53-bit mantissa (same rounding sequence on both sides). DuckDB
    * mirrors with `list_reduce`, whose no-init first-element seed IS
    * this recurrence. Emitted as ppm BIGINT.
    *
    * 100 TB shape: one hash shuffle on user_id; per-user state is the
    * user's own event list (bounded by per-user activity, the same
    * contract as sessionization); the fold is per-row array work, no
    * window over a global order, no second exchange. */
  val ewmaGaps = Q(
    "q_ewma_gaps",
    (spark, dir) => {
      Tables.events(spark, dir)
        // null-ts rows dropped EXPLICITLY on both sides (r15, the
        // funnel-stages latent-parity class): a null t sorts FIRST in
        // Spark's array_sort but LAST under DuckDB's ORDER BY, and a
        // timeless event has no gap semantics anyway
        .filter(col("ts").isNotNull)
        .select(col("user_id"),
                struct(col("ts").cast("long").as("t"),
                       col("event_id").as("e")).as("s"))
        .groupBy(col("user_id"))
        .agg(array_sort(collect_list(col("s"))).as("a"))
        .filter(size(col("a")) >= 2)
        .withColumn("gaps", expr(
          "transform(sequence(2, size(a)), i -> cast(element_at(a, i).t - element_at(a, i-1).t as double))"))
        .select(
          col("user_id"),
          size(col("gaps")).cast("long").as("n_gaps"),
          expr("""cast(floor(aggregate(slice(gaps, 2, size(gaps) - 1),
                                       element_at(gaps, 1),
                                       (acc, g) -> (acc + g) / 2.0)
                          * 1000000.0 + 0.5) as bigint)""").as("ewma_ppm"))
    },
    Some("""
      WITH g AS (
        -- order by FLOOR-seconds then event_id: the exact struct sort
        -- key the Spark side folds in (full-precision ts order could
        -- break same-second ties differently)
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
                 - lag(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000)
                   OVER (PARTITION BY user_id
                         ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 NULLS FIRST,
                                  event_id NULLS FIRST) AS gap,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS tsec, event_id
        FROM events WHERE ts IS NOT NULL),
      l AS (
        SELECT user_id,
               list_transform(list(gap ORDER BY tsec NULLS FIRST, event_id NULLS FIRST),
                              x -> CAST(x AS DOUBLE)) AS gaps
        FROM g WHERE gap IS NOT NULL
        GROUP BY user_id)
      SELECT user_id,
             CAST(len(gaps) AS BIGINT) AS n_gaps,
             CAST(floor(list_reduce(gaps, (acc, x) -> (acc + x) / 2.0)
                        * 1000000.0 + 0.5) AS BIGINT) AS ewma_ppm
      FROM l
    """))

  def all: Seq[Q] = Seq(asofPrevOrder, asofNextOrder, sessionWindows,
    slidingWindows, rangeJoin, scd2History, gapfill, eventTransitions,
    ewmaGaps)
}
