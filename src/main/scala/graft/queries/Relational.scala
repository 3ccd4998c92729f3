package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Money, Q, Tables}
import graft.model.Money.{cents, centsSql}

/** Core relational surface: the reference's windowed-count flagship
  * (reference nifi_spark_kafka_product_view_platform_v2.py:62-69)
  * re-expressed Spark-first in batch form, plus the join / agg / set-op
  * surface the reference implies (SURVEY.md §2.3, §2.7).
  *
  * Determinism notes for the DuckDB oracle hash-compare:
  *  - money is emitted as BIGINT integer cents ([[graft.model.Money]]) —
  *    exact, association-order independent, and free of the cross-engine
  *    DECIMAL representation divergence that plagued decimal outputs;
  *  - event timestamps normalize to microsecond TimestampType via
  *    [[graft.model.Tables.events]] (the physical parquet type varies
  *    by testdata generation); oracles CAST to TIMESTAMP to match;
  *  - every top-k has a total tie-break order.
  */
object Relational {

  /** Flagship (reference v2:62-69): events per platform source per
    * 5-minute tumbling window, descending. Exercises P4 P6 A1 W2 O1. */
  val windowCount = Q(
    "q_window_count",
    (spark, dir) => {
      Tables.events(spark, dir)
        .groupBy(col("event_type"), window(col("ts"), "5 minutes"))
        .agg(count(lit(1)).as("source_number"))
        .select(
          col("window.start").as("window_start"),
          col("window.end").as("window_end"),
          col("event_type").as("source"),
          col("source_number"))
        .orderBy(desc("source_number"), asc("source"), asc("window_start"))
    },
    Some("""
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
             time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) + INTERVAL '5 minutes' AS window_end,
             event_type AS source,
             count(*) AS source_number
      FROM events
      -- Spark's window() rewrite silently drops NULL-ts rows; the
      -- oracle must state the same filter (latent-parity class, r14)
      WHERE ts IS NOT NULL
      GROUP BY 1, 2, 3
      ORDER BY source_number DESC NULLS LAST, source NULLS FIRST, window_start NULLS FIRST
    """))

  /** A2 realized: exact distinct users per source per window (the
    * reference imported approx_count_distinct but shipped count()). */
  val windowDistinctUsers = Q(
    "q_window_distinct_users",
    (spark, dir) => {
      Tables.events(spark, dir)
        .groupBy(col("event_type"), window(col("ts"), "5 minutes"))
        .agg(countDistinct(col("user_id")).as("distinct_users"),
             count(lit(1)).as("source_number"))
        .select(
          col("window.start").as("window_start"),
          col("event_type").as("source"),
          col("distinct_users"),
          col("source_number"))
    },
    Some("""
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
             event_type AS source,
             count(DISTINCT user_id) AS distinct_users,
             count(*) AS source_number
      FROM events
      WHERE ts IS NOT NULL
      GROUP BY 1, 2
    """))

  /** TPC-H Q1-shaped pricing summary: filter + multi-agg with exact
    * integer arithmetic; partial aggregation map-side, 2-col scan.
    * Money columns are BIGINT cents (disc price: 1e-4 units); quantity
    * is a COUNT (integral-valued double), so it casts straight to
    * BIGINT — scaling it by 100 would silently change its meaning.
    * The cutoff compares at DATE granularity (the
    * [[shippingPriority]] TZ-independence pattern: a timestamp
    * literal parses in the session TZ, a date cast round-trips the
    * fixture's naive midnight values through any fixed TZ unchanged —
    * midnight-only invariant re-verified on the round-9 fixture). */
  val pricingSummary = Q(
    "q_pricing_summary",
    (spark, dir) => {
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate").cast("date") <= lit("1998-09-02").cast("date"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_price"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")),
            10000.0)).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(trunc(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_base_price,
             CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)", "10000.0")}) AS BIGINT) AS sum_disc_price,
             count(*) AS count_order
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """))

  /** Filter + projection — predicate pushdown and column pruning reach
    * the parquet scan (PushedFilters in explain). */
  val filterPushdown = Q(
    "q_filter_pushdown",
    (spark, dir) => {
      Tables.events(spark, dir)
        .filter(col("event_type") === "purchase" && col("value") > 100.0)
        .select(col("event_id"), col("user_id"), col("value"))
    },
    Some("""
      SELECT event_id, user_id, value
      FROM events
      WHERE event_type = 'purchase' AND value > 100.0
    """))

  /** Star-schema join (TPC-H Q5 family): revenue per region/nation.
    * nation+region are tiny -> Catalyst broadcasts them; the
    * lineitem⋈orders⋈customer chain shuffles on the join keys once. */
  val joinStar = Q(
    "q_join_star",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
      val o  = Tables.orders(spark, dir)
      val c  = Tables.customer(spark, dir)
      val n  = Tables.nation(spark, dir)
      val r  = Tables.region(spark, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")),
            10000.0)).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some(s"""
      SELECT r_name, n_name,
             CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)", "10000.0")}) AS BIGINT) AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    """))

  /** Explicit broadcast join: part is small at every SF -> broadcast
    * hash join, no shuffle of the big fact side. */
  val broadcastBrand = Q(
    "q_broadcast_brand",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
      val p  = Tables.part(spark, dir)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
             count(lit(1)).as("n_items"))
    },
    Some(s"""
      SELECT p_brand,
             CAST(sum(CAST(trunc(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
             count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
    """))

  /** Left-semi join = EXISTS. */
  val semiJoin = Q(
    "q_semi_join",
    (spark, dir) => {
      val p  = Tables.part(spark, dir)
      val li = Tables.lineitem(spark, dir)
        .filter(col("l_quantity") >= 49.0).select(col("l_partkey"))
      p.join(li, p("p_partkey") === li("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_brand"))
    },
    Some("""
      SELECT p_partkey, p_brand FROM part
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_partkey = p_partkey AND l_quantity >= 49.0)
    """))

  /** Left-anti join = NOT EXISTS: customers with no big-ticket order. */
  val antiJoin = Q(
    "q_anti_join",
    (spark, dir) => {
      val c = Tables.customer(spark, dir)
      val o = Tables.orders(spark, dir)
        .filter(col("o_totalprice") > 300000.0).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
    """))

  /** Left outer join + histogram of lineitems per order (0-count kept). */
  val outerJoinHistogram = Q(
    "q_outer_join_histogram",
    (spark, dir) => {
      val o  = Tables.orders(spark, dir).select(col("o_orderkey"))
      val li = Tables.lineitem(spark, dir).select(col("l_orderkey"))
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left")
        .groupBy(col("o_orderkey"))
        .agg(count(col("l_orderkey")).as("n_items"))
        .groupBy(col("n_items"))
        .agg(count(lit(1)).as("n_orders"))
    },
    Some("""
      SELECT n_items, count(*) AS n_orders FROM (
        SELECT o_orderkey, count(l_orderkey) AS n_items
        FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey)
      GROUP BY n_items
    """))

  /** Set operations: purchasers vs error-raisers (intersect / except /
    * union all), tagged into one result set. */
  val setOps = Q(
    "q_set_ops",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
      val purchasers = ev.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
      val erroring = ev.filter(col("event_type") === "error")
        .select(col("user_id")).distinct()
      purchasers.intersect(erroring).withColumn("tag", lit("both"))
        .unionByName(purchasers.except(erroring).withColumn("tag", lit("purchase_only")))
        .unionByName(erroring.except(purchasers).withColumn("tag", lit("error_only")))
        .select(col("tag"), col("user_id"))
    },
    Some("""
      WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
           e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
      SELECT 'both' AS tag, user_id FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM e)
      UNION ALL
      SELECT 'purchase_only' AS tag, user_id FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM e)
      UNION ALL
      SELECT 'error_only' AS tag, user_id FROM (SELECT user_id FROM e EXCEPT SELECT user_id FROM p)
    """))

  /** distinct + per-type distinct-user counts. */
  val distinctUsers = Q(
    "q_distinct_users",
    (spark, dir) => {
      Tables.events(spark, dir)
        .select(col("event_type"), col("user_id")).distinct()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("distinct_users"))
    },
    Some("""
      SELECT event_type, count(*) AS distinct_users
      FROM (SELECT DISTINCT event_type, user_id FROM events)
      GROUP BY event_type
    """))

  /** approx_count_distinct (A2 as imported in the reference). HLL++
    * sketch values differ from DuckDB's sketch, so the oracle-checkable
    * surface is the exact count plus a 3-sigma accuracy bound: the
    * sketch is deterministic, so `approx_ok` (|approx-exact| within
    * 3*rsd, floor 3) is a stable boolean the driver hash-compares
    * against literal `true` — a sketch regression flips it and fails
    * the gate. Same bound as RelationalSpec's assertion. */
  val approxDistinct = Q(
    "q_approx_distinct_users",
    (spark, dir) => {
      Tables.events(spark, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
             countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")).cast("double") <=
            greatest(lit(3.0), col("exact_users") * 0.06)).as("approx_ok"))
    },
    Some("""
      SELECT event_type, count(DISTINCT user_id) AS exact_users,
             true AS approx_ok
      FROM events
      GROUP BY event_type
    """))

  /** Mergeable-sketch distinct counting — the Datasketches HLL surface
    * (SURVEY §7.3 named mergeable sketch columns as the one aggregate
    * class beyond `approx_count_distinct`; Spark 4 ships it built-in):
    * per (event_type, day) the user stream is sketched ONCE
    * (`hll_sketch_agg`), and the per-type total comes from UNIONING
    * the daily sketches (`hll_union_agg`) — never re-touching raw
    * events. That union-of-partials is the 100 TB pattern: daily
    * sketch columns persist at ingest (a few KB each), and any
    * rollup — per week, per type, fleet-wide — is a sketch merge, not
    * a re-scan. The union is order-independent (slot-max lattice), so
    * the estimate is deterministic; the oracle-checkable surface is
    * the exact count plus the accuracy contract (lgK=12 ⇒ rsd ≈ 1.6%,
    * bound at 5% with floor 3 — the q_approx_distinct_users pattern):
    * `merge_ok` hash-compares against literal `true`, and a sketch
    * regression flips it and fails the gate. */
  val hllMerge = Q(
    "q_hll_merge",
    (spark, dir) => {
      // daily-sketch rollup is over TIMESTAMPED events by definition
      // (a null ts has no day to sketch under); dropped explicitly on
      // both engines so n_days and the exact side read the same event
      // set (r16 null corpus: the null-day window group inflated
      // Spark's n_days while the oracle's count(DISTINCT day) ignored
      // the null day)
      val ev = Tables.events(spark, dir).filter(col("ts").isNotNull)
      val daily = ev
        .groupBy(col("event_type"), window(col("ts"), "1 day").as("day"))
        .agg(hll_sketch_agg(col("user_id"), 12).as("sk"))
      val merged = daily.groupBy(col("event_type").as("m_type"))
        .agg(count(lit(1)).as("n_days"),
             hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val exact = ev
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      // <=> not ===: a NULL event_type is a legitimate GROUP on both
      // engines, and plain equality silently dropped its row from the
      // inner join (r16 null corpus)
      exact.join(merged, col("event_type") <=> col("m_type"))
        .select(col("event_type"), col("exact_users"), col("n_days"),
          (abs(col("est") - col("exact_users")).cast("double") <=
            greatest(lit(3.0), col("exact_users") * 0.05)).as("merge_ok"))
    },
    Some("""
      SELECT event_type, count(DISTINCT user_id) AS exact_users,
             count(DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP))) AS n_days,
             true AS merge_ok
      FROM events
      WHERE ts IS NOT NULL
      GROUP BY event_type
    """))

  /** Global top-k with total tie-break order; price in BIGINT cents. */
  val topkOrders = Q(
    "q_topk_orders",
    (spark, dir) => {
      Tables.orders(spark, dir)
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"),
                cents(col("o_totalprice")).as("total_price"))
    },
    Some(s"""
      SELECT o_orderkey, o_custkey,
             ${centsSql("o_totalprice")} AS total_price
      FROM orders
      ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS FIRST
      LIMIT 10
    """))

  /** TPC-H Q18 shape (large-volume customers): aggregate lineitem
    * FIRST — `sum(l_quantity) > 250` is a HAVING over the grouped
    * scan — then join only the surviving order keys back to orders
    * and customer for the top-10 by price.
    *
    * 100 TB shape: the order is the whole point. lineitem (the 100 TB
    * fact) collapses through ONE map-side-partial aggregate before any
    * join; the HAVING filter leaves a tiny key set, so the
    * orders-side join probes a filtered build and the customer join
    * sees only the survivors — AQE broadcasts both small sides at
    * runtime. Joining first and aggregating second would shuffle the
    * full fact table twice. Finish is TakeOrderedAndProject top-10,
    * never a global sort. Quantities are fixed to per-row integers
    * before summing (exact, association-order independent); money is
    * BIGINT cents. */
  val largeOrders = Q(
    "q_large_orders",
    (spark, dir) => {
      val big = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), cents(col("l_quantity"), 1.0).as("q"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("q")).as("total_qty"))
        .filter(col("total_qty") > 250)
      val o = Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("price_cents"))
      val c = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_name"))
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_name"), col("o_custkey"), col("o_orderkey"),
                col("price_cents"), col("total_qty"))
        .orderBy(desc("price_cents"), asc("o_orderkey"))
        .limit(10)
    },
    Some(s"""
      WITH big AS (
        SELECT l_orderkey,
               CAST(sum(${centsSql("l_quantity", "1.0")}) AS BIGINT) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING CAST(sum(${centsSql("l_quantity", "1.0")}) AS BIGINT) > 250)
      SELECT c_name, o_custkey, o_orderkey,
             ${centsSql("o_totalprice")} AS price_cents, total_qty
      FROM orders
      JOIN big ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY price_cents DESC NULLS LAST, o_orderkey NULLS FIRST
      LIMIT 10
    """))

  /** JSON extraction from the events.props column (reference P2
    * from_json surface in scalar form).
    *
    * INTEGER-k CONTRACT, ENFORCED on both engines (r15 review — the
    * q_length_buckets garbage-input class, verified empirically):
    * on malformed JSON Spark's get_json_object returns NULL while
    * DuckDB's json_extract_string ABORTS; on a non-integral k ('2.5')
    * Spark's ANSI cast throws while DuckDB's CAST ROUNDS to 3. Both
    * sides now gate the cast behind the same ^-?[0-9]+$ shape check
    * (plus json_valid on the DuckDB side, where malformed input would
    * otherwise error before the gate), so a row with malformed props
    * or a non-integer k is EXCLUDED identically instead of aborting
    * one engine or silently diverging. The fixtures' props are
    * well-formed integral k — hashes unchanged; the contract is now
    * by construction. */
  /** The gated extraction, exposed for the spec (malformed / float /
    * missing / OVERFLOWING k must all decode to NULL, never abort —
    * the 18-digit bound keeps every accepted value inside BIGINT on
    * both engines; a 19-digit integer may or may not fit, and an
    * unbounded regex let it through to an ABORT on both sides, r15
    * review). */
  private[graft] def jsonIntK(props: Column): Column = {
    val ks = get_json_object(props, "$.k")
    // \A/\z, not ^/$: Java's $ also matches before a trailing line
    // terminator and cast-to-long trims whitespace, so "123\n" would
    // pass here while DuckDB's RE2 $ (end-of-text) rejects it — a
    // row-level divergence inside the parity gate itself (r16 review).
    when(ks.rlike("\\A-?[0-9]{1,18}\\z"), ks.cast("long"))
  }

  val jsonExtract = Q(
    "q_json_extract",
    (spark, dir) => {
      Tables.events(spark, dir)
        .select(col("event_type"), jsonIntK(col("props")).as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"),
             count(col("k")).as("n_k"),
             max(col("k")).as("max_k"))
    },
    Some("""
      WITH e AS (
        -- Nested CASEs, not one AND chain: DuckDB's adaptive conjunct
        -- reordering may evaluate json_extract_string BEFORE
        -- json_valid in a flat conjunction, aborting on malformed
        -- props (r16 advice, verified on DuckDB 1.0). Nesting makes
        -- the evaluation order structural.
        SELECT event_type,
               CASE WHEN json_valid(props) THEN
                 CASE WHEN regexp_matches(json_extract_string(props, '$.k'),
                                          '^-?[0-9]{1,18}$')
                      THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                 END
               END AS k
        FROM events)
      SELECT event_type,
             CAST(sum(k) AS BIGINT) AS sum_k,
             count(k) AS n_k,
             max(k) AS max_k
      FROM e
      GROUP BY event_type
    """))

  /** Date bucketing: orders per month. */
  val ordersByMonth = Q(
    "q_orders_by_month",
    (spark, dir) => {
      Tables.orders(spark, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"),
             sum(cents(col("o_totalprice"))).as("sum_price"))
    },
    Some(s"""
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             count(*) AS n_orders,
             CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS sum_price
      FROM orders
      GROUP BY 1
    """))

  /** String functions over part. */
  val stringOps = Q(
    "q_string_ops",
    (spark, dir) => {
      Tables.part(spark, dir)
        .select(col("p_brand"),
                lower(col("p_type")).as("lt"),
                length(col("p_name")).as("name_len"),
                size(split(col("p_type"), " ")).as("type_words"))
        .groupBy(col("p_brand"))
        .agg(countDistinct(col("lt")).as("distinct_types"),
             max(col("name_len")).as("max_name_len"),
             sum(col("type_words")).as("sum_type_words"))
    },
    Some("""
      SELECT p_brand,
             count(DISTINCT lower(p_type)) AS distinct_types,
             max(length(p_name)) AS max_name_len,
             CAST(sum(len(string_split(p_type, ' '))) AS BIGINT) AS sum_type_words
      FROM part
      GROUP BY p_brand
    """))

  /** Conditional aggregation (CASE WHEN buckets). */
  val caseWhen = Q(
    "q_case_when",
    (spark, dir) => {
      Tables.orders(spark, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(when(col("o_totalprice") > 200000.0, 1)).as("high"),
          count(when(col("o_totalprice").between(50000.0, 200000.0), 1)).as("mid"),
          count(when(col("o_totalprice") < 50000.0, 1)).as("low"))
    },
    Some("""
      SELECT o_orderpriority,
             count(CASE WHEN o_totalprice > 200000.0 THEN 1 END) AS high,
             count(CASE WHEN o_totalprice BETWEEN 50000.0 AND 200000.0 THEN 1 END) AS mid,
             count(CASE WHEN o_totalprice < 50000.0 THEN 1 END) AS low
      FROM orders
      GROUP BY o_orderpriority
    """))

  /** Scalar subquery: orders above the global mean price, by status. */
  val aboveAvg = Q(
    "q_above_avg",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
      val avgPrice = o.agg(avg(col("o_totalprice")).as("a"))
      o.join(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("a"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"))
    },
    Some("""
      SELECT o_orderstatus, count(*) AS n_orders
      FROM orders
      WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      GROUP BY o_orderstatus
    """))

  /** String timestamp round-trip (reference P5/P10: NiFi stamps a
    * string, Spark parses it back): format to 'yyyy-MM-dd HH:mm:ss',
    * re-parse, bucket per minute. */
  val timestampParse = Q(
    "q_timestamp_parse",
    (spark, dir) => {
      Tables.events(spark, dir)
        .select(to_timestamp(
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
          "yyyy-MM-dd HH:mm:ss").as("parsed"))
        .groupBy(date_trunc("minute", col("parsed")).as("minute"))
        .agg(count(lit(1)).as("n"))
    },
    Some("""
      SELECT date_trunc('minute',
               strptime(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S'),
                        '%Y-%m-%d %H:%M:%S')) AS minute,
             count(*) AS n
      FROM events
      GROUP BY 1
    """))

  /** Skew-mitigating salted join (graft.operators.SaltedJoin):
    * revenue per supplier nation with the lineitem side salted 8 ways.
    * The oracle is the PLAIN join — salting must not change results. */
  val saltedJoin = Q(
    "q_salted_join",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_suppkey"),
          cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")),
            10000.0).as("rev"))
      val s = Tables.supplier(spark, dir)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      graft.operators.SaltedJoin.inner(li, s, "l_suppkey", salts = 8)
        .groupBy(col("s_nationkey"))
        .agg(sum(col("rev")).as("revenue"))
    },
    Some(s"""
      SELECT s_nationkey,
             CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)", "10000.0")}) AS BIGINT) AS revenue
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1
    """))

  /** Typed-Aggregator UDAF (graft.functions.Aggregators): discounted
    * revenue per return flag through `functions.udaf`, oracled against
    * the equivalent built-in integer-cents aggregation. */
  val udafRevenue = Q(
    "q_udaf_revenue",
    (spark, dir) => {
      val rev = udaf(graft.functions.Aggregators.DiscountedRevenue)
      Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(rev(col("l_extendedprice"), col("l_discount")).as("r"))
        .select(col("l_returnflag"),
                col("r.revenue").as("revenue"),
                col("r.n_items").as("n_items"))
    },
    Some(s"""
      SELECT l_returnflag,
             CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)", "10000.0")}) AS BIGINT) AS revenue,
             count(l_extendedprice * (1.0 - l_discount)) AS n_items
      FROM lineitem
      GROUP BY l_returnflag
    """))

  /** Full outer join: all customers x all big-order buckets, nulls on
    * both sides preserved. */
  val fullOuterJoin = Q(
    "q_full_outer_join",
    (spark, dir) => {
      val c = Tables.customer(spark, dir)
        .filter(col("c_acctbal") > 9000.0)
        .select(col("c_custkey"), col("c_acctbal"))
      val o = Tables.orders(spark, dir)
        .filter(col("o_totalprice") > 400000.0)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(col("c_custkey"), col("o_custkey"), col("n_big"))
    },
    Some("""
      SELECT c_custkey, o_custkey, n_big
      FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0) c
      FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_big
                       FROM orders WHERE o_totalprice > 400000.0
                       GROUP BY 1) o
        ON c.c_custkey = o.o_custkey
    """))

  /** Bag-semantics set ops: UNION ALL / INTERSECT ALL / EXCEPT ALL
    * keep duplicate multiplicity (the distinct variants are q_set_ops). */
  val setOpsAll = Q(
    "q_set_ops_all",
    (spark, dir) => {
      val e = Tables.events(spark, dir)
      val purch = e.filter(col("event_type") === "purchase").select(col("user_id"))
      val err = e.filter(col("event_type") === "error").select(col("user_id"))
      purch.unionAll(err).groupBy(col("user_id")).agg(count(lit(1)).as("n_union"))
        .join(purch.intersectAll(err).groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_intersect")), Seq("user_id"), "left")
        .join(purch.exceptAll(err).groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_except")), Seq("user_id"), "left")
    },
    Some("""
      WITH p AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
           e AS (SELECT user_id FROM events WHERE event_type = 'error'),
           u AS (SELECT user_id, count(*) AS n_union
                 FROM (SELECT * FROM p UNION ALL SELECT * FROM e) GROUP BY 1),
           i AS (SELECT user_id, count(*) AS n_intersect
                 FROM (SELECT * FROM p INTERSECT ALL SELECT * FROM e) GROUP BY 1),
           x AS (SELECT user_id, count(*) AS n_except
                 FROM (SELECT * FROM p EXCEPT ALL SELECT * FROM e) GROUP BY 1)
      SELECT u.user_id, n_union, n_intersect, n_except
      FROM u LEFT JOIN i USING (user_id) LEFT JOIN x USING (user_id)
    """))

  /** Deterministic array aggregation: sorted distinct event types per
    * user (sort_array makes collect_set order-stable). The array is
    * emitted joined to a scalar string — the driver's pandas-based
    * row sort cannot order list columns (unhashable ndarray). */
  val arrayAgg = Q(
    "q_array_agg",
    (spark, dir) => {
      Tables.events(spark, dir)
        .groupBy(col("user_id"))
        .agg(array_join(sort_array(collect_set(col("event_type"))), ",").as("types"),
             count(lit(1)).as("n"))
    },
    Some("""
      SELECT user_id,
             array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types,
             count(*) AS n
      FROM events
      GROUP BY user_id
    """))

  /** TPC-H Q3 shape (shipping priority): segment-filtered customers ⋈
    * date-bounded orders ⋈ post-date lineitems, per-order revenue,
    * top-10 — the classic selective multi-way join + agg + top-k that
    * exercises join ordering, filter pushdown on BOTH join sides and
    * a TakeOrdered finish in one plan. Revenue is exact BIGINT cents
    * summed from per-row cents ([[graft.model.Money]]); the top-10
    * order carries an l_orderkey tiebreak so revenue ties cannot
    * reorder across engines.
    *
    * 100 TB shape: the filtered customer side is dimension-scaled and
    * broadcasts; lineitem⋈orders shuffles once on the order key with
    * both date filters pushed to the scans; the rollup groups on the
    * already-partitioned order key, and the finish is
    * TakeOrderedAndProject, never a global sort.
    *
    * The cutoff compares at DATE granularity: a timestamp literal like
    * `lit("1995-03-15").cast("timestamp")` parses in the session
    * timezone while DuckDB's `TIMESTAMP '1995-03-15'` is naive, so the
    * boundary would shift for a driver running outside UTC. Casting the
    * column to date round-trips the parquet's naive midnight value
    * through ANY fixed session TZ unchanged, and the fixture's
    * o_orderdate/l_shipdate are midnight-only (verified at sf0.01 and
    * sf0.1), so date-level and timestamp-level comparison are exactly
    * equivalent. */
  val shippingPriority = Q(
    "q_shipping_priority",
    (spark, dir) => {
      val cutoff = lit("1995-03-15").cast("date")
      val c = Tables.customer(spark, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = Tables.orders(spark, dir)
        .filter(col("o_orderdate").cast("date") < cutoff)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
                col("o_orderpriority"))
      val l = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate").cast("date") > cutoff)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"))
        .orderBy(desc("revenue_cents"), asc("o_orderdate"), asc("l_orderkey"))
        .limit(10)
    },
    Some(s"""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)")}) AS BIGINT)
               AS revenue_cents
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
        AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
      GROUP BY 1, 2, 3
      ORDER BY revenue_cents DESC NULLS LAST, o_orderdate NULLS FIRST, l_orderkey NULLS FIRST
      LIMIT 10
    """))

  /** CDC upsert merge (MERGE INTO semantics without a table format):
    * apply a change set — updates, deletes, inserts — onto a base
    * snapshot and emit the merged next snapshot. The incremental-
    * refresh operator every training-data pipeline needs: yesterday's
    * corpus + today's crawl delta -> today's corpus, without rewriting
    * rows that didn't change semantically.
    *
    * The change set here derives deterministically from the base so
    * the oracle can recompute it: keys ≡3 (mod 10) are updated
    * (status 'U', +100.00), keys ≡7 are tombstoned, and keys ≡1 spawn
    * an insert under a fresh key (+1e9, provably disjoint from the
    * base key space). The MERGE itself is the general shape: tag base
    * rows version 0 and change rows version 1, union, keep
    * `max_by(payload, version)` per key, drop tombstones.
    *
    * 100 TB shape: ONE shuffle on the merge key with map-side partial
    * `max_by` (an aggregate, NOT a per-key window sort — no
    * sort-within-group at all); the change set streams through the
    * same exchange. This out-scales the join-based MERGE spelling
    * (anti-join + union) which shuffles base twice. The oracle is an
    * INDEPENDENT spelling (direct selection of surviving rows), so a
    * merge-machinery bug cannot cancel out of both sides. */
  val upsertSnapshot = Q(
    "q_upsert_snapshot",
    (spark, dir) => {
      val base = Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_orderstatus").as("status"),
        cents(col("o_totalprice")).as("price_cents"))
      val m10 = pmod(col("o_orderkey"), lit(10))
      val updates = base.filter(m10 === 3).select(
        col("o_orderkey"), lit("U").as("status"),
        (col("price_cents") + 10000L).as("price_cents"),
        lit(false).as("tombstone"))
      val deletes = base.filter(m10 === 7).select(
        col("o_orderkey"), col("status"), col("price_cents"),
        lit(true).as("tombstone"))
      val inserts = base.filter(m10 === 1).select(
        (col("o_orderkey") + 1000000000L).as("o_orderkey"),
        lit("N").as("status"), col("price_cents"),
        lit(false).as("tombstone"))
      val tagged = base.withColumn("tombstone", lit(false)).withColumn("v", lit(0))
        .unionByName(updates.unionByName(deletes).unionByName(inserts)
          .withColumn("v", lit(1)))
      tagged
        .groupBy(col("o_orderkey"))
        .agg(max_by(struct(col("status"), col("price_cents"), col("tombstone")),
          col("v")).as("r"))
        .filter(!col("r.tombstone"))
        .select(col("o_orderkey"), col("r.status").as("status"),
                col("r.price_cents").as("price_cents"))
    },
    Some(s"""
      SELECT o_orderkey, o_orderstatus AS status,
             ${centsSql("o_totalprice")} AS price_cents
      FROM orders WHERE o_orderkey % 10 NOT IN (3, 7)
      UNION ALL
      SELECT o_orderkey, 'U' AS status,
             ${centsSql("o_totalprice")} + 10000 AS price_cents
      FROM orders WHERE o_orderkey % 10 = 3
      UNION ALL
      SELECT o_orderkey + 1000000000 AS o_orderkey, 'N' AS status,
             ${centsSql("o_totalprice")} AS price_cents
      FROM orders WHERE o_orderkey % 10 = 1
    """))

  /** TPC-H Q5 shape (local supplier volume): revenue from lineitems
    * whose supplier and ordering customer share a nation, for one
    * region and one order-year, grouped by nation. The distinguishing
    * plan feature vs [[joinStar]] is the EXTRA equality
    * `c_nationkey = s_nationkey` folded into the supplier join
    * condition (not a post-filter), which is what makes Q5 the
    * classic join-order stress test. nation/region are bounded dims
    * and broadcast; customer/orders/lineitem each shuffle on their
    * join key once; supplier grows with the corpus so it is NOT
    * hinted. Dates compare at DATE granularity (fixture timestamps
    * are midnight-only — see [[shippingPriority]]'s TZ note). */
  val localSupplierVolume = Q(
    "q_local_supplier_volume",
    (spark, dir) => {
      val c = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"))
      val o = Tables.orders(spark, dir)
        .filter(col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date") &&
                col("o_orderdate").cast("date") <  lit("1997-01-01").cast("date"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
                cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val s = Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey"))
      val n = Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(s, col("l_suppkey") === col("s_suppkey") &&
                 col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).as("revenue_cents"))
    },
    Some(s"""
      SELECT n_name,
             CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)")}) AS BIGINT)
               AS revenue_cents
      FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
      GROUP BY n_name
    """))

  /** TPC-H Q7 shape (volume shipping between nation pairs): revenue
    * flowing supplier-nation -> customer-nation between distinct
    * members of a nation set, per ship-year. The nation filter is
    * applied to the TINY side first — supplier and customer each
    * pre-join their broadcast nation slice, so the three big joins
    * only ever carry rows that can still qualify (manual pushdown of
    * a disjunctive cross-table predicate Catalyst cannot split on
    * its own); the distinct-pair filter afterwards removes the
    * same-nation combinations. The set is 5 nations (not TPC-H's 2)
    * because the sf0.001 fixture's supplier table is so small that
    * most single pairs have zero cross-flow. Ship-year extracts from
    * the DATE cast (midnight-only fixture, TZ-proof). */
  val nationVolume = Q(
    "q_nation_volume",
    (spark, dir) => {
      val pair = Seq("NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4")
      val n1 = Tables.nation(spark, dir)
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(spark, dir)
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val s = Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .select(col("s_suppkey"), col("supp_nation"))
      val c = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .select(col("c_custkey"), col("cust_nation"))
      val l = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date") &&
                col("l_shipdate").cast("date") <  lit("1998-01-01").cast("date"))
        .select(col("l_orderkey"), col("l_suppkey"),
                year(col("l_shipdate").cast("date")).cast("long").as("l_year"),
                cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(s, col("l_suppkey") === col("s_suppkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(col("rev")).as("revenue_cents"))
    },
    Some(s"""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS l_year,
             CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)")}) AS BIGINT)
               AS revenue_cents
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
        AND n2.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
        AND n1.n_name <> n2.n_name
        AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
      GROUP BY 1, 2, 3
    """))

  /** TPC-H Q10 shape (returned-item reporting): the 20 customers who
    * returned the most revenue in one quarter, with their nation.
    * Returnflag + date filters reach both scans (pushdown); the
    * grouped sum lands in a TakeOrderedAndProject top-20 with a
    * total tie-break, never a global sort. Account balance rides
    * through the grouping as exact integer cents. */
  val returnedItems = Q(
    "q_returned_items",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
        .filter(col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date") &&
                col("o_orderdate").cast("date") <  lit("1996-04-01").cast("date"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(spark, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
                cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val c = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_name"),
                cents(col("c_acctbal")).as("acctbal_cents"), col("c_nationkey"))
      val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("acctbal_cents"), col("n_name"))
        .agg(sum(col("rev")).as("revenue_cents"))
        .orderBy(desc("revenue_cents"), asc("c_custkey"))
        .limit(20)
    },
    Some(s"""
      SELECT c_custkey, c_name, ${centsSql("c_acctbal")} AS acctbal_cents, n_name,
             CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)")}) AS BIGINT)
               AS revenue_cents
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        AND CAST(o_orderdate AS DATE) <  DATE '1996-04-01'
      GROUP BY 1, 2, 3, 4
      ORDER BY revenue_cents DESC NULLS LAST, c_custkey NULLS FIRST
      LIMIT 20
    """))

  /** TPC-H Q17 shape (small-quantity-order revenue): lineitems whose
    * quantity is below 20% of their part's average quantity, rolled
    * up by brand — the canonical correlated-aggregate decorrelation
    * shape, expressed as a self-aggregation + join-back so BOTH
    * engines run the same decorrelated plan. The `qty < 0.2 * avg`
    * comparison is exact integer cross-multiplication
    * (5 * qty * count < sum) — quantities are integral, so no float
    * division or rounding can disagree at a boundary. Two shuffles on
    * l_partkey (the per-part stats and the join-back); part only
    * supplies the brand label. */
  val smallQtyRevenue = Q(
    "q_small_qty_revenue",
    (spark, dir) => {
      val l = Tables.lineitem(spark, dir)
        .select(col("l_partkey"), cents(col("l_quantity"), 1.0).as("qi"),
                cents(col("l_extendedprice")).as("price_cents"))
      val stats = l.groupBy(col("l_partkey"))
        .agg(sum(col("qi")).as("sum_qi"), count(lit(1)).as("cnt"))
      val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
      l.join(stats, "l_partkey")
        .filter(col("qi") * lit(5L) * col("cnt") < col("sum_qi"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"), sum(col("price_cents")).as("revenue_cents"))
    },
    Some(s"""
      WITH stats AS (
        SELECT l_partkey,
               CAST(sum(${centsSql("l_quantity", "1.0")}) AS BIGINT) AS sum_qi,
               count(*) AS cnt
        FROM lineitem GROUP BY 1)
      SELECT p_brand, count(*) AS n_lines,
             CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS revenue_cents
      FROM lineitem
        JOIN stats USING (l_partkey)
        JOIN part ON l_partkey = p_partkey
      WHERE ${centsSql("l_quantity", "1.0")} * 5 * cnt < sum_qi
      GROUP BY p_brand
    """))

  /** TPC-H Q14 shape (promotion-effect revenue): one ship-month of
    * lineitem joined to part, with the promo share emitted as TWO
    * exact BIGINT cent sums (promo and total) rather than the
    * benchmark's percentage — a cross-engine float division has no
    * place in an oracle-checked output, and the consumer can divide.
    * The conditional aggregate rides the SAME join pass (no second
    * scan); the date filter pushes to the lineitem scan. */
  val promoRevenue = Q(
    "q_promo_revenue",
    (spark, dir) => {
      val l = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate").cast("date") >= lit("1996-03-01").cast("date") &&
                col("l_shipdate").cast("date") <  lit("1996-04-01").cast("date"))
        .select(col("l_partkey"),
                cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", col("rev")).otherwise(0L))
               .as("promo_cents"),
             sum(col("rev")).as("total_cents"),
             count(lit(1)).as("n_lines"))
    },
    Some(s"""
      SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                           THEN ${centsSql("l_extendedprice * (1.0 - l_discount)")}
                           ELSE 0 END) AS BIGINT) AS promo_cents,
             CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)")}) AS BIGINT)
               AS total_cents,
             count(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-03-01'
        AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
    """))

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    * an OR of three (brand, size-range, quantity-range) conjunctions
    * that couples columns from BOTH join sides — the classic test of
    * Catalyst's disjunction handling: the common single-table
    * disjuncts (brand/size for part, quantity for lineitem) must be
    * extracted and pushed below the join so each scan prunes, while
    * the cross-table residual evaluates post-join. Grouped by brand
    * so each arm of the disjunction is visible in the output. */
  val brandRevenue = Q(
    "q_brand_revenue",
    (spark, dir) => {
      val l = Tables.lineitem(spark, dir)
        .select(col("l_partkey"), cents(col("l_quantity"), 1.0).as("qty"),
                cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val p = Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
             col("qty").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
             col("qty").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
             col("qty").between(20, 30)))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"), sum(col("rev")).as("revenue_cents"))
    },
    Some(s"""
      SELECT p_brand, count(*) AS n_lines,
             CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)")}) AS BIGINT)
               AS revenue_cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
             AND ${centsSql("l_quantity", "1.0")} BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
             AND ${centsSql("l_quantity", "1.0")} BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
             AND ${centsSql("l_quantity", "1.0")} BETWEEN 20 AND 30)
      GROUP BY p_brand
    """))

  /** TPC-H Q4 shape (order-priority checking): orders in one quarter
    * with AT LEAST ONE slow lineitem, counted per priority — the
    * grouped-EXISTS shape. The reference predicate (commit vs
    * receipt date) uses columns this schema lacks, so "slow" is
    * re-expressed as shipped more than 90 days after the order date;
    * the correlated EXISTS decorrelates to a LEFT SEMI join on
    * o_orderkey, which is the plan feature Q4 exists to test (the
    * probe side deduplicates inside the join — no distinct pass).
    * The date arithmetic stays at DATE granularity (TZ-proof). */
  val priorityCheck = Q(
    "q_priority_check",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
        .filter(col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date") &&
                col("o_orderdate").cast("date") <  lit("1996-04-01").cast("date"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
                col("o_orderpriority"))
      val slow = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(slow,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate").cast("date") > date_add(col("o_orderdate").cast("date"), 90),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n_orders
      FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        AND CAST(o_orderdate AS DATE) <  DATE '1996-04-01'
        AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 90 DAY)
      GROUP BY o_orderpriority
    """))

  /** TPC-H Q22 shape (global sales opportunity): customers with an
    * above-average account balance and no RECENT orders (the fixture
    * generator gives virtually every customer at least one order
    * ever, so "never ordered" is empty by construction — lapsed
    * customers keep the semantics non-trivial), rolled up by nation.
    * The plan composition is what Q22 exists to test: a scalar
    * subquery (1-row global average, broadcast) feeding a LEFT ANTI
    * join whose build side is date-filtered at the scan. The
    * average-balance threshold compares in exact integer cents
    * cross-multiplied by the customer count (bal * n > sum ⟺
    * bal > avg), so no float division enters the predicate on
    * either engine. */
  val idleRich = Q(
    "q_idle_rich",
    (spark, dir) => {
      val c = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"),
                cents(col("c_acctbal")).as("bal"))
      val stats = c.filter(col("bal") > 0)
        .agg(sum(col("bal")).as("s"), count(lit(1)).as("n"))
      val recent = Tables.orders(spark, dir)
        .filter(col("o_orderdate").cast("date") >= lit("2000-01-01").cast("date"))
        .select(col("o_custkey"))
      val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
      c.crossJoin(broadcast(stats))
        .filter(col("bal") * col("n") > col("s"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"), sum(col("bal")).as("total_bal_cents"))
    },
    Some(s"""
      WITH c AS (
        SELECT c_custkey, c_nationkey, ${centsSql("c_acctbal")} AS bal
        FROM customer),
      stats AS (
        SELECT CAST(sum(bal) AS BIGINT) AS s, count(*) AS n
        FROM c WHERE bal > 0)
      SELECT n_name, count(*) AS n_customers,
             CAST(sum(bal) AS BIGINT) AS total_bal_cents
      FROM c, stats
        JOIN nation ON c_nationkey = n_nationkey
      WHERE bal * n > s
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
      GROUP BY n_name
    """))

  /** TPC-H Q2 shape (min-cost supplier): the classic correlated scalar
    * subquery — "the supplier offering each part at its minimum cost
    * within a region" — expressed as aggregate-then-rejoin on the
    * group key, the distributed form of a correlated MIN: per-part
    * minimum cost among EUROPE suppliers, joined back on
    * (part, cost == min). The fixture has no partsupp table, so
    * lineitem rows act as the supplier offers (cost = the exact-cents
    * line price; reference data model per TESTDATA.md). Supplier and
    * nation/region dims broadcast (100 / 25 / 5 rows); the size filter
    * prunes the part probe side at the scan. Ties (several suppliers
    * at the min) keep ALL rows, like Q2 itself — deterministic set
    * semantics, no arbitrary pick. */
  val minCostSupplier = Q(
    "q_min_cost_supplier",
    (spark, dir) => {
      val eu = Tables.supplier(spark, dir)
        .join(Tables.nation(spark, dir),
              col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(spark, dir).filter(col("r_name") === "EUROPE"),
              col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
      val offers = Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_suppkey"),
                cents(col("l_extendedprice")).as("cost_cents"))
        .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
      val mn = offers.groupBy(col("l_partkey"))
        .agg(min(col("cost_cents")).as("min_cost"))
      val p = Tables.part(spark, dir)
        .filter(col("p_size") <= 10)
        .select(col("p_partkey"), col("p_type"))
      offers.join(mn, Seq("l_partkey"))
        .filter(col("cost_cents") === col("min_cost"))
        .join(p, col("l_partkey") === col("p_partkey"))
        // a part's min offer can appear on several lineitems of the
        // same supplier — Q2 reports the supplier once per part
        .select(col("p_partkey"), col("p_type"), col("s_name"),
                col("n_name"), col("cost_cents")).distinct()
    },
    Some(s"""
      WITH eu AS (
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
      offers AS (
        SELECT l_partkey, s_name, n_name,
               ${centsSql("l_extendedprice")} AS cost_cents
        FROM lineitem JOIN eu ON l_suppkey = s_suppkey),
      mn AS (
        SELECT l_partkey, min(cost_cents) AS min_cost
        FROM offers GROUP BY 1)
      SELECT DISTINCT p_partkey, p_type, s_name, n_name, cost_cents
      FROM offers
        JOIN mn USING (l_partkey)
        JOIN part ON l_partkey = p_partkey
      WHERE cost_cents = min_cost AND p_size <= 10
    """))

  /** TPC-H Q11 shape (important stock): per-part value held by one
    * region's suppliers, filtered to parts above a threshold derived
    * from a SCALAR subquery over the same aggregate. The threshold is
    * scale-invariant — value > 2x the mean per-part value — compared
    * by exact integer cross-multiplication (value * n_parts >
    * 2 * total), so no float division enters the predicate and the
    * selected fraction stays stable as the corpus grows (a fixed
    * fraction-of-total threshold like Q11's 0.0001 selects ~nothing
    * once the part count scales up). The 1-row totals broadcast back
    * via crossJoin — the audited q_above_avg scalar-subquery pattern. */
  val importantParts = Q(
    "q_important_parts",
    (spark, dir) => {
      val asia = Tables.supplier(spark, dir)
        .join(Tables.nation(spark, dir),
              col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"))
      val perPart = Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_suppkey"),
                cents(col("l_extendedprice")).as("pc"))
        .join(broadcast(asia), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("pc")).as("value_cents"))
      val tot = perPart.agg(sum(col("value_cents")).as("total"),
                            count(lit(1)).as("n_parts"))
      perPart.crossJoin(broadcast(tot))
        .filter(col("value_cents") * col("n_parts") > col("total") * lit(2L))
        .select(col("l_partkey").as("p_partkey"), col("value_cents"))
    },
    Some(s"""
      WITH asia AS (
        SELECT s_suppkey
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'),
      per_part AS (
        SELECT l_partkey AS p_partkey,
               CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS value_cents
        FROM lineitem JOIN asia ON l_suppkey = s_suppkey
        GROUP BY 1),
      tot AS (
        SELECT CAST(sum(value_cents) AS BIGINT) AS total,
               count(*) AS n_parts
        FROM per_part)
      SELECT p_partkey, value_cents
      FROM per_part, tot
      WHERE value_cents * n_parts > total * 2
    """))

  /** TPC-H Q15 shape (top supplier): revenue per supplier over one
    * ship-year, returning the supplier(s) whose revenue EQUALS the
    * maximum — the scalar-MAX subquery shape. The 1-row max broadcasts
    * back over the 100-row per-supplier aggregate (crossJoin, audited
    * scalar pattern); exact-cents revenue makes the equality
    * cross-engine safe where Q15's float SUM comparison would not be.
    * Date bounds compare at DATE granularity (TZ-independent, the
    * [[shippingPriority]] pattern). */
  val topSupplier = Q(
    "q_top_supplier",
    (spark, dir) => {
      val rev = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date") &&
                col("l_shipdate").cast("date") < lit("1997-01-01").cast("date"))
        .groupBy(col("l_suppkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")),
                       10000.0)).as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("max_revenue"))
        .join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    },
    Some(s"""
      WITH rev AS (
        SELECT l_suppkey,
               CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)", "10000.0")}) AS BIGINT)
                 AS total_revenue
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        GROUP BY 1),
      mx AS (SELECT max(total_revenue) AS max_revenue FROM rev)
      SELECT s_suppkey, s_name, total_revenue
      FROM rev, mx
        JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_revenue = max_revenue
    """))

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the
    * multi-EXISTS curriculum piece — one EXISTS (another supplier
    * contributed to the same order) and one NOT EXISTS (no other
    * supplier shipped later), both over self-joins of the same fact
    * table. The fixture has no receipt/commit dates, so "kept the
    * order waiting" = shipped strictly last among multi-supplier
    * finished ('F') orders, on l_shipdate. Spark-first: EXISTS is a
    * LEFT SEMI join and NOT EXISTS a LEFT ANTI join, both equi-keyed
    * on l_orderkey with the supplier/date inequality as the residual
    * condition — shuffle-hash/SMJ on the order key, never a
    * nested-loop. Finish is TakeOrderedAndProject with a total
    * tie-break (count desc, name asc) over the 100-supplier rollup. */
  val waitingSupplier = Q(
    "q_waiting_supplier",
    (spark, dir) => {
      val fOrders = Tables.orders(spark, dir)
        .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      val l1 = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      val l2 = l1.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
      val l3 = l1.select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"),
                         col("l_shipdate").as("sd3"))
      l1.join(l2, col("l_orderkey") === col("ok2") &&
                  col("l_suppkey") =!= col("sk2"), "left_semi")
        .join(l3, col("l_orderkey") === col("ok3") &&
                  col("l_suppkey") =!= col("sk3") &&
                  col("sd3") > col("l_shipdate"), "left_anti")
        .join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), asc("s_name"))
        .limit(10)
    },
    Some("""
      WITH f AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'),
      l AS (
        SELECT l_orderkey, l_suppkey, l_shipdate
        FROM lineitem JOIN f ON l_orderkey = o_orderkey)
      SELECT s_name, count(*) AS numwait
      FROM l l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      WHERE EXISTS (
          SELECT 1 FROM l l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM l l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > l1.l_shipdate)
      GROUP BY s_name
      ORDER BY numwait DESC NULLS LAST, s_name NULLS FIRST
      LIMIT 10
    """))

  /** TPC-H Q6 shape (forecast-revenue change): the pure scan-side
    * query — conjunctive range predicates on ONE table, no join, one
    * global aggregate. The whole point at 100 TB is that every
    * predicate reaches the parquet scan (row-group pruning does the
    * work; the executors see a fraction of the table) and the
    * aggregate is a partial-final pair over a 1-row exchange. Revenue
    * is the per-row float product floored to exact 1e-4 dollar units
    * BEFORE the sum — one IEEE multiply is deterministic cross-engine,
    * a float SUM is not. */
  val forecastRevenue = Q(
    "q_forecast_revenue",
    (spark, dir) => {
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date") &&
                col("l_shipdate").cast("date") < lit("1997-01-01").cast("date") &&
                col("l_discount").between(0.05, 0.07) &&
                col("l_quantity") < 24)
        .agg(count(lit(1)).as("n_lines"),
             sum(cents(col("l_extendedprice") * col("l_discount"), 10000.0))
               .as("revenue_units"))
    },
    Some(s"""
      SELECT count(*) AS n_lines,
             CAST(sum(${centsSql("l_extendedprice * l_discount", "10000.0")}) AS BIGINT)
               AS revenue_units
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24
    """))

  /** TPC-H Q12 shape (shipping modes / priority split): fact-to-fact
    * equi-join with a date-arithmetic residual filter, finishing in a
    * TWO-WAY conditional aggregate on one pass (no second scan for
    * the second count). The fixture has no l_shipmode, so the group
    * key is l_returnflag and "late" = shipped more than 60 days after
    * the order date. */
  val lateLines = Q(
    "q_late_lines",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_shipdate"), col("l_returnflag"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate").cast("date") >
                date_add(col("o_orderdate").cast("date"), 60))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
    },
    Some("""
      SELECT l_returnflag,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60
      GROUP BY l_returnflag
    """))

  /** TPC-H Q16 shape (supplier counts by part attribute): DISTINCT
    * supplier count per (p_type, p_size) with a NOT-IN exclusion
    * subquery — expressed Spark-first as a LEFT ANTI join (never a
    * driver-side collect of the exclusion set). "Suppliers with
    * complaints" = negative account balance in the fixture. The
    * distinct-count shuffles on the group key; the part dimension
    * broadcast-prunes at the scan (p_size <= 5). */
  val supplierCounts = Q(
    "q_supplier_counts",
    (spark, dir) => {
      val excluded = Tables.supplier(spark, dir)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      val p = Tables.part(spark, dir)
        .filter(col("p_size") <= 5)
        .select(col("p_partkey"), col("p_type"), col("p_size"))
      Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
              "left_anti")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },
    Some("""
      SELECT p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size <= 5
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_type, p_size
    """))

  /** TPC-H Q20 shape (excess stock / dominant supplier): the nested
    * correlated-aggregate curriculum piece — per (part, supplier)
    * year-volume compared against the SAME aggregate rolled up per
    * part, joined back on the part key with an exact integer
    * cross-multiplied threshold (2*own > total ⟺ own > 50%), then a
    * supplier rollup. Quantities are integral-valued doubles → exact
    * BIGINT units; no partsupp table in the fixture, so shipped
    * volume stands in for stock. */
  val dominantSupplier = Q(
    "q_dominant_supplier",
    (spark, dir) => {
      val y = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date") &&
                col("l_shipdate").cast("date") < lit("1997-01-01").cast("date"))
        .select(col("l_partkey"), col("l_suppkey"),
                col("l_quantity").cast("long").as("qty"))
      val ps = y.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("qty")).as("own_qty"))
      val pt = ps.groupBy(col("l_partkey"))
        .agg(sum(col("own_qty")).as("total_qty"))
      ps.join(pt, "l_partkey")
        .filter(col("own_qty") * lit(2L) > col("total_qty"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_dominated"), sum(col("own_qty")).as("sum_qty"))
        .join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_dominated"),
                col("sum_qty"))
    },
    Some("""
      WITH y AS (
        SELECT l_partkey, l_suppkey, CAST(trunc(l_quantity) AS BIGINT) AS qty
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'),
      ps AS (
        SELECT l_partkey, l_suppkey, CAST(sum(qty) AS BIGINT) AS own_qty
        FROM y GROUP BY 1, 2),
      pt AS (
        SELECT l_partkey, CAST(sum(own_qty) AS BIGINT) AS total_qty
        FROM ps GROUP BY 1)
      SELECT s_suppkey, s_name, count(*) AS n_dominated,
             CAST(sum(own_qty) AS BIGINT) AS sum_qty
      FROM ps JOIN pt USING (l_partkey)
        JOIN supplier ON l_suppkey = s_suppkey
      WHERE own_qty * 2 > total_qty
      GROUP BY s_suppkey, s_name
    """))

  /** TPC-H Q8 shape (national market share): revenue in one REGION's
    * market per order year, emitted as the focal nation's share
    * numerator and the market denominator — two exact cent sums off
    * ONE join pass and one aggregate (the promoRevenue discipline: a
    * cross-engine float division has no place in an oracled output).
    * Customer nation scopes the market (AMERICA); supplier nation
    * (NATION_3) is the share numerator. All dims broadcast. */
  val marketShare = Q(
    "q_market_share",
    (spark, dir) => {
      val n = Tables.nation(spark, dir)
      val cNat = n.join(Tables.region(spark, dir)
          .filter(col("r_name") === "AMERICA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_natkey"))
      val c = Tables.customer(spark, dir)
        .join(broadcast(cNat), col("c_nationkey") === col("c_natkey"))
        .select(col("c_custkey"))
      val o = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"),
                year(col("o_orderdate").cast("date")).as("o_year"))
      val s = Tables.supplier(spark, dir)
        .join(broadcast(n.select(col("n_nationkey"), col("n_name"))),
              col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
                cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")),
                      10000.0).as("vol"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_3", col("vol"))
               .otherwise(0L)).as("nation_volume"),
             sum(col("vol")).as("market_volume"))
    },
    Some(s"""
      SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
             CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                      THEN ${centsSql("l_extendedprice * (1.0 - l_discount)", "10000.0")}
                      ELSE 0 END) AS BIGINT) AS nation_volume,
             CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)", "10000.0")}) AS BIGINT)
               AS market_volume
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE o_custkey IN (
        SELECT c_custkey FROM customer
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          JOIN region ON cn.n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA')
      GROUP BY 1
    """))

  /** TPC-H Q9 shape (product-type profit by nation and year): the
    * classic multi-way star join (lineitem ⋈ part ⋈ supplier ⋈
    * nation) with a computed per-row margin, grouped by (nation,
    * year). Margin = line revenue minus 80% of catalog cost
    * (p_retailprice × quantity — the fixture has no ps_supplycost),
    * each term floored to exact 1e-4 dollar units per row BEFORE the
    * subtraction and sum. Dims broadcast; the fact table never
    * shuffles until the final (nation, year) aggregate. */
  val nationProfit = Q(
    "q_nation_profit",
    (spark, dir) => {
      val p = Tables.part(spark, dir)
        .filter(col("p_type") === "PROMO")
        .select(col("p_partkey"), col("p_retailprice"))
      val s = Tables.supplier(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      Tables.lineitem(spark, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name"), year(col("l_shipdate").cast("date")).as("o_year"))
        .agg(sum(
          cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000.0)
            - cents(col("p_retailprice") * col("l_quantity") * lit(0.8), 10000.0))
          .as("profit_units"))
    },
    Some(s"""
      SELECT n_name, CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS o_year,
             CAST(sum(${centsSql("l_extendedprice * (1.0 - l_discount)", "10000.0")}
                      - ${centsSql("p_retailprice * l_quantity * 0.8", "10000.0")}) AS BIGINT)
               AS profit_units
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE p_type = 'PROMO'
      GROUP BY 1, 2
    """))

  /** TPC-H Q13 shape (customer order-count distribution): the LEFT
    * OUTER join whose right-side predicate lives INSIDE the join
    * condition — the NOT LIKE must filter orders without dropping
    * order-less customers (moving it to a WHERE turns the outer join
    * inner and silently loses the zero-order bucket, the classic Q13
    * trap). The fixture has no o_comment, so the NOT LIKE runs on
    * o_orderpriority (excludes '4-NOT SPECIFIED'). Spark-first:
    * Catalyst pushes the single-side join condition below the outer
    * join into the orders scan, both sides shuffle once on the
    * customer key, and both aggregations are partial+final hash-agg
    * pairs — the second over at most max-orders-per-customer rows.
    * Completes the 22-shape classic join-plan curriculum. */
  val orderCountDist = Q(
    "q_order_count_dist",
    (spark, dir) => {
      val c = Tables.customer(spark, dir).select(col("c_custkey"))
      val o = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      c.join(o, c("c_custkey") === o("o_custkey") &&
                !col("o_orderpriority").like("%SPECIFIED%"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },
    Some("""
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey
             AND o_orderpriority NOT LIKE '%SPECIFIED%'
            GROUP BY c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST
    """))

  def all: Seq[Q] = Seq(
    windowCount, windowDistinctUsers, pricingSummary, filterPushdown,
    joinStar, broadcastBrand, semiJoin, antiJoin, outerJoinHistogram,
    setOps, distinctUsers, approxDistinct, topkOrders, jsonExtract,
    ordersByMonth, stringOps, caseWhen, aboveAvg, timestampParse,
    saltedJoin, udafRevenue, fullOuterJoin, setOpsAll, arrayAgg,
    shippingPriority, upsertSnapshot, largeOrders, localSupplierVolume,
    nationVolume, returnedItems, smallQtyRevenue, promoRevenue, brandRevenue,
    priorityCheck, idleRich, minCostSupplier, importantParts, topSupplier,
    waitingSupplier, forecastRevenue, lateLines, supplierCounts,
    dominantSupplier, marketShare, nationProfit, orderCountDist, hllMerge)
}
