package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.{Q, Tables}

/** Data-layout operators: the planning-side math behind scan pruning.
  *
  * At 100 TB the fastest query is the one that never reads most of the
  * data: parquet/iceberg readers prune whole files and row groups from
  * footer min/max statistics (zone maps), and how well that works is
  * determined entirely by the physical sort/cluster key chosen at write
  * time. These queries compute both halves distributed: the Z-order
  * clustering key a writer would range-partition by, and the pruning
  * selectivity a given layout actually buys for a given predicate —
  * metadata-scale results from one map-side-combined aggregate each.
  */
object Layout {

  /** Interleave the low 16 bits of `c` into even bit positions (the
    * classic magic-number bit spread) — four shift/mask steps, all
    * codegen'd built-ins, evaluated scan-side with zero shuffles.
    * Long arithmetic throughout so Spark and DuckDB agree bit-exactly. */
  private def spread16(c: Column): Column = {
    val a = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order (Morton) key over two 16-bit dimensions. */
  private def zkey16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Z-order layout audit over orders on (customer, order-day): Morton
    * key per row, then per 64k-key bucket the row count and the min/max
    * extent of BOTH dimensions. Each bucket of contiguous Z values is a
    * bounded rectangle in (custkey, day) space — exactly the property
    * that makes min/max zone maps selective for predicates on EITHER
    * column after a Z-order write, where a plain sort clusters only its
    * leading column. A writer would `repartitionByRange(zkey)` +
    * `sortWithinPartitions(zkey)` with this audit as the layout check.
    *
    * 100 TB shape: the key is four shift/mask built-ins inline in the
    * scan (whole-stage codegen, no UDF), and the audit is ONE hash
    * aggregate with map-side partials onto ~`keyspace/65536` bucket
    * rows — the data never sorts and never moves except for that
    * aggregate. Cross-engine exactness: pure integer bit arithmetic,
    * identical magic constants both sides. */
  val zorderLayout = Q(
    "q_zorder_layout",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
      val x = col("o_custkey").bitwiseAND(lit(65535L))
      val y = datediff(col("o_orderdate").cast("date"),
                       lit("1992-01-01").cast("date"))
        .cast("long").bitwiseAND(lit(65535L))
      o.select(x.as("x"), y.as("y"))
        .withColumn("zkey", zkey16(col("x"), col("y")))
        .groupBy((col("zkey") / 65536L).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
             min(col("x")).as("min_x"), max(col("x")).as("max_x"),
             min(col("y")).as("min_y"), max(col("y")).as("max_y"))
    },
    Some("""
      WITH b AS (SELECT o_custkey & 65535 AS x,
                        date_diff('day', DATE '1992-01-01',
                                  CAST(o_orderdate AS DATE)) & 65535 AS y
                 FROM orders),
      s1 AS (SELECT x, y, (x | (x << 8)) & 16711935 AS xa,
                          (y | (y << 8)) & 16711935 AS ya FROM b),
      s2 AS (SELECT x, y, (xa | (xa << 4)) & 252645135 AS xb,
                          (ya | (ya << 4)) & 252645135 AS yb FROM s1),
      s3 AS (SELECT x, y, (xb | (xb << 2)) & 858993459 AS xc,
                          (yb | (yb << 2)) & 858993459 AS yc FROM s2),
      s4 AS (SELECT x, y, (xc | (xc << 1)) & 1431655765 AS xd,
                          (yc | (yc << 1)) & 1431655765 AS yd FROM s3)
      SELECT (xd | (yd << 1)) // 65536 AS bucket, count(*) AS n,
             min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y
      FROM s4 GROUP BY 1
    """))

  /** Zone-map pruning selectivity: simulate two physical layouts of
    * lineitem — `natural` (arrival order: 512-order chunks, the shape
    * of an unclustered ingest) and `weekly` (time-partitioned files by
    * ship week) — build each chunk's min/max ship-date zone map, and
    * report how many chunks a Q1 1997 date predicate prunes and how
    * many rows the surviving chunks force the scanner to read vs the
    * rows that actually match. The natural layout prunes ~nothing
    * (ship dates are uncorrelated with order keys); the weekly layout
    * reads within a chunk-width of the matching rows — the measured
    * argument for time-partitioning fact tables.
    *
    * 100 TB shape: one hash aggregate per layout (map-side combined)
    * down to per-chunk rows, then a second aggregate over the tiny
    * chunk table; no joins, no sort, predicate math in exact integer /
    * DATE comparisons. This is precisely the footer-stats calculation
    * a reader does at plan time, made queryable. */
  val zoneMapPruning = Q(
    "q_zone_map_pruning",
    (spark, dir) => {
      val lo = lit("1997-01-01").cast("date")
      val hi = lit("1997-03-31").cast("date")
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_shipdate").cast("date").as("ship"))
      def stats(layout: String, chunk: Column): DataFrame =
        li.groupBy(chunk.as("chunk"))
          .agg(min(col("ship")).as("mn"), max(col("ship")).as("mx"),
               count(lit(1)).as("n"),
               sum((col("ship") >= lo && col("ship") <= hi).cast("long"))
                 .as("nm"))
          .agg(count(lit(1)).as("n_chunks"),
               sum((col("mx") < lo || col("mn") > hi).cast("long"))
                 .as("n_pruned"),
               sum(when(col("mx") < lo || col("mn") > hi, 0L)
                 .otherwise(col("n"))).as("rows_read"),
               sum(col("nm")).as("rows_matching"))
          .select(lit(layout).as("layout"), col("n_chunks"),
                  col("n_pruned"), col("rows_read"), col("rows_matching"))
      val natural = stats("natural", expr("l_orderkey div 512"))
      val weekly = stats("weekly",
        expr("CAST(datediff(ship, DATE '1992-01-01') AS BIGINT) div 7"))
      natural.unionByName(weekly)
    },
    Some("""
      WITH li AS (SELECT l_orderkey, CAST(l_shipdate AS DATE) AS ship
                  FROM lineitem),
      cn AS (SELECT l_orderkey // 512 AS chunk, min(ship) AS mn,
                    max(ship) AS mx, count(*) AS n,
                    CAST(sum(CASE WHEN ship BETWEEN DATE '1997-01-01'
                                       AND DATE '1997-03-31'
                                  THEN 1 ELSE 0 END) AS BIGINT) AS nm
             FROM li GROUP BY 1),
      cw AS (SELECT date_diff('day', DATE '1992-01-01', ship) // 7 AS chunk,
                    min(ship) AS mn, max(ship) AS mx, count(*) AS n,
                    CAST(sum(CASE WHEN ship BETWEEN DATE '1997-01-01'
                                       AND DATE '1997-03-31'
                                  THEN 1 ELSE 0 END) AS BIGINT) AS nm
             FROM li GROUP BY 1)
      SELECT 'natural' AS layout, count(*) AS n_chunks,
             CAST(sum(CASE WHEN mx < DATE '1997-01-01'
                                OR mn > DATE '1997-03-31'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
             CAST(sum(CASE WHEN mx < DATE '1997-01-01'
                                OR mn > DATE '1997-03-31'
                           THEN 0 ELSE n END) AS BIGINT) AS rows_read,
             CAST(sum(nm) AS BIGINT) AS rows_matching
      FROM cn
      UNION ALL
      SELECT 'weekly', count(*),
             CAST(sum(CASE WHEN mx < DATE '1997-01-01'
                                OR mn > DATE '1997-03-31'
                           THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN mx < DATE '1997-01-01'
                                OR mn > DATE '1997-03-31'
                           THEN 0 ELSE n END) AS BIGINT),
             CAST(sum(nm) AS BIGINT)
      FROM cw
    """))

  /** One-pass column profile of `orders` — the table-stats view behind
    * both governance (null audits, key-cardinality checks) and the
    * optimizer's own cost model (ANALYZE TABLE computes exactly these).
    * Per column: non-null count, exact distinct count, and min/max of a
    * type-dispatched INTEGER IMAGE (ids as-is, money in cents, dates as
    * epoch days, strings by length) so every output cell is a BIGINT —
    * the decimal/collation-proof representation the oracle contract
    * requires (Money scaladoc; string min/max would drag in collation).
    *
    * 100 TB shape: ONE scan. Six exact `count(DISTINCT)`s in a single
    * aggregate plan as an Expand (×7 rows) feeding partial then final
    * hash aggregates — one exchange of pre-aggregated (column, value)
    * groups, never the raw table; the stacked 6-row result is a local
    * generate over the 1-row aggregate. That is the plan ANALYZE runs,
    * and it beats six separate scans 6:1 on I/O, the scarce resource
    * at 100 TB. (Approximate NDV via HLL would drop the Expand; this
    * profile keeps exactness so the oracle can hash-match it.) */
  val columnProfile = Q(
    "q_column_profile",
    (spark, dir) => {
      import graft.model.Money.cents
      val epochDays = (c: Column) =>
        datediff(c.cast("date"), lit("1970-01-01").cast("date")).cast("long")
      // (column, integer image for min/max)
      val cols: Seq[(String, Column)] = Seq(
        "o_orderkey"      -> col("o_orderkey"),
        "o_custkey"       -> col("o_custkey"),
        "o_orderstatus"   -> length(col("o_orderstatus")).cast("long"),
        "o_totalprice"    -> cents(col("o_totalprice")),
        "o_orderdate"     -> epochDays(col("o_orderdate")),
        "o_orderpriority" -> length(col("o_orderpriority")).cast("long"))
      val aggs = cols.flatMap { case (n, img) => Seq(
        count(col(n)).as(s"${n}_nn"),
        countDistinct(col(n)).as(s"${n}_nd"),
        min(img).as(s"${n}_mn"),
        max(img).as(s"${n}_mx")) }
      Tables.orders(spark, dir)
        .agg(aggs.head, aggs.tail: _*)
        .select(explode(array(cols.map { case (n, _) => struct(
          lit(n).as("col_name"),
          col(s"${n}_nn").as("n_nonnull"),
          col(s"${n}_nd").as("n_distinct"),
          col(s"${n}_mn").as("min_i"),
          col(s"${n}_mx").as("max_i")) }: _*)).as("p"))
        .select(col("p.col_name"), col("p.n_nonnull"), col("p.n_distinct"),
                col("p.min_i"), col("p.max_i"))
        .orderBy(col("col_name"))
    },
    Some {
      def row(n: String, img: String) = s"""
        SELECT '$n' AS col_name, count($n) AS n_nonnull,
               count(DISTINCT $n) AS n_distinct,
               CAST(min($img) AS BIGINT) AS min_i,
               CAST(max($img) AS BIGINT) AS max_i
        FROM orders"""
      Seq(
        row("o_orderkey", "o_orderkey"),
        row("o_custkey", "o_custkey"),
        row("o_orderstatus", "length(o_orderstatus)"),
        row("o_totalprice",
            "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"),
        row("o_orderdate",
            "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))"),
        row("o_orderpriority", "length(o_orderpriority)"))
        .mkString("", " UNION ALL", "\n      ORDER BY col_name NULLS FIRST")
    })

  /** Core of [[integrityAudit]], parameterized over the input frames so
    * the spec can drive it with INJECTED violations (the fixture star
    * schema is referentially clean, so the registered query's
    * violation counts are all zero — the spec proves the counting path
    * actually counts). Emits one row per constraint check:
    * `(check_name, n_violations, n_checked)`.
    *
    * 100 TB shape: each base table is scanned ONCE. All three lineitem
    * FK checks ride a single fact pass — one shuffle join against the
    * deduped orders key, two broadcast left joins against the part /
    * supplier key sets — then a 1-row aggregate; orders' PK
    * uniqueness, custkey null-rate and customer FK share one pass the
    * same way (`count - countDistinct` gives duplicate-PK extra rows
    * without a second groupBy). Dim key sets are deduped pre-join so a
    * violated PK cannot inflate `n_checked` on the fact side. The
    * per-branch 1-row aggregates explode into check rows and union —
    * no crossJoin, nothing driver-side. */
  def integrityChecks(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame, nation: DataFrame,
                      part: DataFrame, supplier: DataFrame): DataFrame = {
    val nBad = (c: Column) => sum(when(c, 1L).otherwise(0L))
    val li = lineitem
      .join(orders.select(col("o_orderkey")).distinct(),
            col("l_orderkey") === col("o_orderkey"), "left")
      .join(broadcast(part.select(col("p_partkey")).distinct()),
            col("l_partkey") === col("p_partkey"), "left")
      .join(broadcast(supplier.select(col("s_suppkey")).distinct()),
            col("l_suppkey") === col("s_suppkey"), "left")
      .agg(count(lit(1)).as("n"),
           nBad(col("o_orderkey").isNull).as("fk_o"),
           nBad(col("p_partkey").isNull).as("fk_p"),
           nBad(col("s_suppkey").isNull).as("fk_s"))
      .select(explode(array(
        struct(lit("lineitem_fk_orders").as("check_name"),
               col("fk_o").as("n_violations"), col("n").as("n_checked")),
        struct(lit("lineitem_fk_part").as("check_name"),
               col("fk_p").as("n_violations"), col("n").as("n_checked")),
        struct(lit("lineitem_fk_supplier").as("check_name"),
               col("fk_s").as("n_violations"), col("n").as("n_checked"))))
        .as("r"))
    val ord = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(customer.select(col("c_custkey")).distinct(),
            col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n"),
           countDistinct(col("o_orderkey")).as("nd"),
           nBad(col("o_custkey").isNull).as("null_ck"),
           nBad(col("o_custkey").isNotNull && col("c_custkey").isNull)
             .as("fk_c"))
      .select(explode(array(
        struct(lit("orders_fk_customer").as("check_name"),
               col("fk_c").as("n_violations"), col("n").as("n_checked")),
        struct(lit("orders_null_custkey").as("check_name"),
               col("null_ck").as("n_violations"), col("n").as("n_checked")),
        struct(lit("orders_pk_duplicate_rows").as("check_name"),
               (col("n") - col("nd")).as("n_violations"),
               col("n").as("n_checked"))))
        .as("r"))
    val cust = customer.select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey")).distinct()),
            col("c_nationkey") === col("n_nationkey"), "left")
      .agg(count(lit(1)).as("n"),
           nBad(col("c_nationkey").isNotNull && col("n_nationkey").isNull)
             .as("fk_n"))
      .select(explode(array(
        struct(lit("customer_fk_nation").as("check_name"),
               col("fk_n").as("n_violations"), col("n").as("n_checked"))))
        .as("r"))
    li.unionByName(ord).unionByName(cust)
      .select(col("r.check_name"), col("r.n_violations"), col("r.n_checked"))
      .orderBy(col("check_name"))
  }

  /** Content-addressed DATASET FINGERPRINT — the reproducibility
    * primitive a training pipeline pins before a run: per table, an
    * order-independent checksum of every row's canonical serialization
    * (md5-derived 60-bit row hash folded mod 1e9+7, summed), plus row
    * count and hash min/max. Two snapshots with equal fingerprints are
    * content-identical regardless of file layout, partition order or
    * row order; a single flipped byte moves the checksum. Canonical
    * serialization pins the cross-engine-stable forms: BIGINT decimal
    * strings, money as integer cents, timestamps as floor-epoch
    * seconds, dates as yyyy-MM-dd.
    *
    * The serialization is INJECTIVE, which is what makes the
    * content-identity claim true rather than merely probable: every
    * field is NULL-coalesced to a sentinel containing the '|'
    * delimiter (impossible in any delimiter-free field, so (a, NULL)
    * never collides with (a, "NULL")), and the free-text fields
    * (events.props, documents.text — each the last field of its row)
    * are length-prefixed so an embedded '|' cannot shift field
    * boundaries. Precondition, asserted by fixture shape: the
    * non-free-text fields are numeric casts, dates, or enumerated
    * codes that cannot contain '|'.
    *
    * 100 TB shape: pure map-side hashing on unshuffled scans, one
    * 1-row partial+final aggregate per table — the cheapest possible
    * full-table pass (same class as count(*)). The mod-1e9+7 fold
    * keeps each row term < 2^30, so the BIGINT sum holds to ~9e9 rows
    * per table; beyond that, fold partial sums mod 1e9+7 again (the
    * sum is associative either way). */
  /** One table's fingerprint row from a canonical row serialization —
    * see [[tableFingerprint]]. Exposed for the sensitivity spec. */
  private[graft] def fingerprintOf(df: DataFrame, name: String,
                                     ser: Column): DataFrame =
    df.select((TextOps.h60(ser) % 1000000007L).as("h"))
      .agg(count(lit(1)).as("n_rows"),
           sum(col("h")).as("hash_checksum"),
           min(col("h")).as("hash_min"),
           max(col("h")).as("hash_max"))
      .select(lit(name).as("table_name"), col("n_rows"),
              col("hash_checksum"), col("hash_min"), col("hash_max"))

  /** NULL-coalesce a delimiter-free field to a sentinel that CONTAINS
    * the delimiter — unreachable by any legal field value, so the
    * serialization stays injective (concat_ws would otherwise SKIP the
    * null and (a, NULL, b) would collide with (a, b, NULL)). */
  private def fpField(c: Column): Column =
    coalesce(c.cast("string"), lit("|NULL"))

  /** Length-prefix a free-text field (`n:text`) so an embedded '|'
    * cannot shift field boundaries; NULL takes the same '|NULL'
    * sentinel (a length-prefixed value always starts with a digit, so
    * the two forms cannot collide). Explicit CASE, not concat-of-null:
    * DuckDB's concat() skips NULL arguments where Spark's propagates —
    * the exact cross-engine trap this query exists to pin down. */
  private def fpText(c: Column): Column =
    when(c.isNull, lit("|NULL"))
      .otherwise(concat(length(c).cast("string"), lit(":"), c))
  private def fpFieldSql(x: String): String =
    s"coalesce(CAST($x AS VARCHAR), '|NULL')"
  private def fpTextSql(x: String): String =
    s"CASE WHEN $x IS NULL THEN '|NULL' ELSE CAST(length($x) AS VARCHAR) || ':' || $x END"

  val tableFingerprint = Q(
    "q_table_fingerprint",
    (spark, dir) => {
      import graft.model.Money.cents
      val fp = fingerprintOf _
      val o = Tables.orders(spark, dir)
      val e = Tables.events(spark, dir)
      val d = Tables.documents(spark, dir)
      fp(o, "orders", concat_ws("|",
          fpField(col("o_orderkey")), fpField(col("o_custkey")),
          fpField(col("o_orderstatus")),
          fpField(cents(col("o_totalprice"))),
          fpField(col("o_orderdate").cast("date").cast("string")),
          fpField(col("o_orderpriority"))))
        .unionAll(fp(e, "events", concat_ws("|",
          fpField(col("event_id")), fpField(col("ts").cast("long")),
          fpField(col("user_id")), fpField(col("event_type")),
          fpField(cents(col("value"))), fpText(col("props")))))
        .unionAll(fp(d, "documents", concat_ws("|",
          fpField(col("doc_id")), fpField(col("lang")),
          fpField(col("source")), fpText(col("text")))))
    },
    Some(s"""
      SELECT 'orders' AS table_name, count(*) AS n_rows,
             CAST(sum(h) AS BIGINT) AS hash_checksum,
             min(h) AS hash_min, max(h) AS hash_max
      FROM (SELECT ${TextOps.h60Sql(
              s"""concat_ws('|', ${fpFieldSql("o_orderkey")},
                 ${fpFieldSql("o_custkey")}, ${fpFieldSql("o_orderstatus")},
                 ${fpFieldSql("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")},
                 ${fpFieldSql("CAST(CAST(o_orderdate AS DATE) AS VARCHAR)")},
                 ${fpFieldSql("o_orderpriority")})""")}
               % 1000000007 AS h FROM orders)
      UNION ALL
      SELECT 'events', count(*), CAST(sum(h) AS BIGINT), min(h), max(h)
      FROM (SELECT ${TextOps.h60Sql(
              s"""concat_ws('|', ${fpFieldSql("event_id")},
                 ${fpFieldSql("epoch_us(CAST(ts AS TIMESTAMP)) // 1000000")},
                 ${fpFieldSql("user_id")}, ${fpFieldSql("event_type")},
                 ${fpFieldSql("CAST(floor(\"value\" * 100.0 + 0.5) AS BIGINT)")},
                 ${fpTextSql("props")})""")}
               % 1000000007 AS h FROM events)
      UNION ALL
      SELECT 'documents', count(*), CAST(sum(h) AS BIGINT), min(h), max(h)
      FROM (SELECT ${TextOps.h60Sql(
              s"""concat_ws('|', ${fpFieldSql("doc_id")}, ${fpFieldSql("lang")},
                 ${fpFieldSql("source")}, ${fpTextSql("text")})""")}
               % 1000000007 AS h FROM documents)
    """))

  /** Referential-integrity / data-quality audit of the star schema —
    * the Deequ-style constraint suite (FK orphans, PK uniqueness,
    * null rates) a pipeline runs before promoting a snapshot. See
    * [[integrityChecks]] for the one-scan-per-table plan argument;
    * the spec injects orphans/dup keys/nulls to prove the counters. */
  val integrityAudit = Q(
    "q_integrity_audit",
    (spark, dir) =>
      integrityChecks(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
                      Tables.customer(spark, dir), Tables.nation(spark, dir),
                      Tables.part(spark, dir), Tables.supplier(spark, dir)),
    Some("""
      WITH l AS (
        SELECT count(*) AS n,
               sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS fk_o,
               sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS fk_p,
               sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS fk_s
        FROM lineitem li
        LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
          ON li.l_orderkey = o.o_orderkey
        LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
          ON li.l_partkey = p.p_partkey
        LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
          ON li.l_suppkey = s.s_suppkey),
      o AS (
        SELECT count(*) AS n, count(DISTINCT o_orderkey) AS nd,
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_ck,
               sum(CASE WHEN o_custkey IS NOT NULL AND c.c_custkey IS NULL
                        THEN 1 ELSE 0 END) AS fk_c
        FROM orders
        LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
          ON o_custkey = c.c_custkey),
      cu AS (
        SELECT count(*) AS n,
               sum(CASE WHEN c_nationkey IS NOT NULL AND n.n_nationkey IS NULL
                        THEN 1 ELSE 0 END) AS fk_n
        FROM customer
        LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
          ON c_nationkey = n.n_nationkey)
      SELECT * FROM (
        SELECT 'lineitem_fk_orders' AS check_name,
               CAST(fk_o AS BIGINT) AS n_violations,
               CAST(n AS BIGINT) AS n_checked FROM l
        UNION ALL
        SELECT 'lineitem_fk_part', CAST(fk_p AS BIGINT),
               CAST(n AS BIGINT) FROM l
        UNION ALL
        SELECT 'lineitem_fk_supplier', CAST(fk_s AS BIGINT),
               CAST(n AS BIGINT) FROM l
        UNION ALL
        SELECT 'orders_fk_customer', CAST(fk_c AS BIGINT),
               CAST(n AS BIGINT) FROM o
        UNION ALL
        SELECT 'orders_null_custkey', CAST(null_ck AS BIGINT),
               CAST(n AS BIGINT) FROM o
        UNION ALL
        SELECT 'orders_pk_duplicate_rows', CAST(n - nd AS BIGINT),
               CAST(n AS BIGINT) FROM o
        UNION ALL
        SELECT 'customer_fk_nation', CAST(fk_n AS BIGINT),
               CAST(n AS BIGINT) FROM cu)
      ORDER BY check_name NULLS FIRST
    """))

  def all: Seq[Q] = Seq(zorderLayout, zoneMapPruning, columnProfile,
    integrityAudit, tableFingerprint)
}
