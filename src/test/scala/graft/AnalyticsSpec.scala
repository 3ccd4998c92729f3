package graft

import org.apache.spark.sql.functions._
import graft.queries.Analytics

class AnalyticsSpec extends SparkSpec {

  test("approx_percentile tracks exact percentiles within the sketch's rank tolerance") {
    // GK sketch with accuracy=1000 bounds rank error by n/1000; on
    // o_totalprice (roughly uniform across its range) that translates
    // to a small relative value error. Assert each approx quantile is
    // within 2% of the exact interpolated one — loose enough for the
    // sketch, tight enough to catch a broken percentile definition.
    // (The query itself now emits the rank-bound booleans the driver
    // oracles; this test re-derives the raw values for the tighter
    // relative-error assertion.)
    val exact = Analytics.percentiles.fn(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val approx = graft.model.Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(expr("approx_percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.95), 1000)").as("ap"))
      .collect().map { r =>
        val a = r.getSeq[Double](1); r.getString(0) -> (a(0), a(1), a(2), a(3))
      }.toMap
    assert(exact.keySet == approx.keySet)
    for (k <- exact.keySet) {
      val (e, a) = (exact(k), approx(k))
      val pairs = Seq(("p25", e._1, a._1), ("p50", e._2, a._2),
                      ("p75", e._3, a._3), ("p95", e._4, a._4))
      for ((name, ev, av) <- pairs) {
        val rel = math.abs(av - ev) / math.max(math.abs(ev), 1e-9)
        assert(rel <= 0.02, s"$k/$name: approx $av vs exact $ev (rel err $rel)")
      }
    }
    // and the driver-facing bound booleans must all be true
    val oks = Analytics.approxPercentiles.fn(spark, sf).collect()
    oks.foreach { r =>
      (1 to 4).foreach(i => assert(r.getBoolean(i), s"bound check $i false for ${r.getString(0)}"))
    }
  }

  test("exact ntile stays long-typed and covers all tiles") {
    val q = Analytics.ntileQuartiles.fn(spark, sf)
    assert(q.schema("quartile").dataType == org.apache.spark.sql.types.LongType)
    val tiles = q.select("quartile").collect().map(_.getLong(0)).toSet
    assert(tiles == Set(1L, 2L, 3L, 4L))
  }

  test("trailing revenue: peak bounded by single-order max and customer total") {
    import graft.model.Money.cents
    val rows = Analytics.trailingRevenue.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val bounds = graft.model.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(max(cents(col("o_totalprice"))).as("mx"),
           sum(cents(col("o_totalprice"))).as("tot"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (c, peak) = (r.getAs[Long]("o_custkey"), r.getAs[Long]("peak_30d_cents"))
      val (mx, tot) = bounds(c)
      // a 30-day window contains at least the order itself, at most all
      assert(peak >= mx && peak <= tot, s"peak $peak outside [$mx, $tot] for $c")
    }
  }

  test("event transitions: mass balances and rows sum to ~1e6 ppm") {
    val rows = graft.queries.TemporalOps.eventTransitions.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // every event except each user's first contributes one transition
    val ev = graft.model.Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
    // per source state the floored ppm row sums to (1e6 - residue),
    // residue < number of target states
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val s = rs.map(_.getAs[Long]("p_ppm")).sum
      assert(s > 1000000L - rs.length && s <= 1000000L,
        s"row $from ppm mass $s")
    }
  }

  test("basket pairs: canonical order, support floor, and lift consistency") {
    val rows = Analytics.basketPairs.fn(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
      val (nb, na, nB) = (r.getAs[Long]("n_both"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(a < b, "pair not canonical")
      assert(nb >= 2, "support floor violated")
      // a pair can't co-occur more often than either item occurs
      assert(nb <= math.min(na, nB))
      assert(r.getAs[Long]("lift_ppm") > 0L)
    }
  }
}
