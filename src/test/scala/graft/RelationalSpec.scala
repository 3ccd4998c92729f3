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
      .agg(org.apache.spark.sql.functions.sum("source_number")).head.getLong(0)
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
}
