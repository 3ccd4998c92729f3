package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query runs and returns rows at sf0.001") {
    Relational.all.foreach { q =>
      val n = q.fn(spark, sf).count()
      assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("flagship window counts sum to total event count") {
    val total = graft.model.Tables.events(spark, sf).count()
    val summed = Relational.windowCount.fn(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("source_number")).head().getLong(0)
    assert(summed == total)
  }

  test("approx_count_distinct is within 3*rsd of exact") {
    // the query emits the bound as a boolean (driver-oracled against
    // literal true); a sketch regression surfaces as approx_ok=false
    val rows = Relational.approxDistinct.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_ok"),
        s"approx_count_distinct outside 3*rsd for ${r.getString(0)} " +
          s"(exact=${r.getAs[Long]("exact_users")})")
    }
  }

  test("window boundaries are epoch-aligned 5-minute buckets") {
    import org.apache.spark.sql.functions._
    val bad = Relational.windowCount.fn(spark, sf)
      .filter(unix_timestamp(col("window_start")) % 300 =!= 0 ||
              unix_timestamp(col("window_end")) - unix_timestamp(col("window_start")) =!= 300)
      .count()
    assert(bad == 0)
  }

  test("queries and oracleSql keys line up") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("integrity audit counts injected violations (fixture is clean, so prove the counters)") {
    import spark.implicits._
    // orders: dup PK (2), null custkey (3,NULL), orphan custkey (4,99)
    val orders = Seq((1L, Some(10L)), (2L, Some(10L)), (2L, Some(20L)),
                     (3L, Option.empty[Long]), (4L, Some(99L)))
      .toDF("o_orderkey", "o_custkey")
    // customer 20 -> nation 200 which does not exist
    val customer = Seq((10L, 100L), (20L, 200L)).toDF("c_custkey", "c_nationkey")
    val nation = Seq(Tuple1(100L)).toDF("n_nationkey")
    // lineitem: orphan order 9, orphan part 8, orphan supplier 6
    val lineitem = Seq((1L, 7L, 5L), (9L, 7L, 5L), (1L, 8L, 5L), (1L, 7L, 6L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
    val part = Seq(Tuple1(7L)).toDF("p_partkey")
    val supplier = Seq(Tuple1(5L)).toDF("s_suppkey")
    val got = graft.queries.Layout
      .integrityChecks(lineitem, orders, customer, nation, part, supplier)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "lineitem_fk_orders" -> ((1L, 4L)),
      "lineitem_fk_part" -> ((1L, 4L)),
      "lineitem_fk_supplier" -> ((1L, 4L)),
      "orders_fk_customer" -> ((1L, 5L)),
      "orders_null_custkey" -> ((1L, 5L)),
      "orders_pk_duplicate_rows" -> ((1L, 5L)),
      "customer_fk_nation" -> ((1L, 2L))), s"got $got")
    // and the registered query over the fixture star schema is clean
    val reg = graft.queries.Layout.integrityAudit.fn(spark, sf)
      .filter($"n_violations" > 0L).count()
    assert(reg == 0L, "fixture unexpectedly has integrity violations")
  }

  test("hll merge: union-of-daily-sketches estimate is deterministic and in contract") {
    val a = Relational.hllMerge.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(a.nonEmpty)
    a.values.foreach { case (exact, nDays, ok) =>
      assert(ok, "sketch estimate outside the 5% contract")
      assert(exact > 0L && nDays > 0L)
    }
    // slot-max lattice: a second independent sketch+union pass lands on
    // the identical booleans and counts
    val b = Relational.hllMerge.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(a == b)
  }

  test("json k extraction: malformed / float / missing k decode to NULL, never abort (r15 contract)") {
    // the cross-engine garbage-input class, verified empirically:
    // DuckDB json_extract_string ABORTS on malformed JSON where
    // get_json_object returns NULL, and DuckDB CAST('2.5' AS BIGINT)
    // ROUNDS where Spark's ANSI cast throws. The shape gate makes all
    // three cases EXCLUDED identically; this pins the Spark half
    // (the oracle half carries the same CASE + json_valid gate).
    import spark.implicits._
    val rows = Seq(
      ("""{"k": 42}""", Some(42L)),
      ("""{"k": "7"}""", Some(7L)),   // quoted integer still extracts
      ("""{"k": 2.5}""", None),       // non-integral -> excluded
      ("""{"k": "x"}""", None),       // non-numeric -> excluded
      ("""not json""", None),         // malformed -> excluded, no abort
      ("""{"j": 1}""", None),         // k absent -> excluded
      ("""{"k": -3}""", Some(-3L)),   // negative integer passes the gate
      // 19+ digits may overflow BIGINT: an unbounded regex let this
      // through to an ABORT on BOTH engines (r15 review) — the
      // 18-digit bound excludes it identically instead
      ("""{"k": 9223372036854775808}""", None),
      ("""{"k": 999999999999999999}""", Some(999999999999999999L)))
    val got = rows.map(_._1).toDF("props")
      .select(Relational.jsonIntK($"props").as("k"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == rows.map(_._2),
      s"gated extraction mismatch: ${got.toSeq} vs ${rows.map(_._2)}")
  }
}
