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
    val rows = Relational.approxDistinct.fn(spark, sf).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.06,
        s"approx=$approx exact=$exact off by more than 6%")
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
