package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.PrefixSum

class PrefixSumSpec extends SparkSpec {

  test("distributed exclusive prefix sum equals the single-partition window") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("id", "v")
    val got = PrefixSum.exclusive(df, Seq(col("id")), "v", "pfx",
        numPartitions = Some(8))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.select(col("id"), coalesce(sum(col("v")).over(w), lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("distributed exclusive prefix MIN equals the single-partition window") {
    import spark.implicits._
    // values deliberately non-monotone in the sort order, with ties
    val df = (1L to 1000L).map(i => (i, (i * 37) % 101)).toDF("id", "v")
    val got = PrefixSum.exclusiveMin(df, Seq(col("id")), "v", "pm",
        numPartitions = Some(8))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.select(col("id"),
        coalesce(min(col("v")).over(w), lit(Long.MaxValue)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("q_pareto_frontier equals the brute-force dominance skyline") {
    val pts = graft.model.Tables.part(spark, sf)
      .select((floor(col("p_retailprice") * 100.0 + 0.5)).cast("long").as("x"),
              col("p_size").cast("long").as("y"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    // O(n^2) reference on the driver — fine at sf0.001 distinct points
    val want = pts.filter { case (x, y) =>
      !pts.exists { case (px, py) =>
        px <= x && py <= y && (px < x || py < y)
      }
    }.toSet
    val got = graft.queries.Analytics.paretoFrontier.fn(spark, sf)
      .collect().map(r => (r.getAs[Long]("price_c"), r.getAs[Long]("p_size")))
      .toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("pack chunks: totals are consistent and straddlers are bounded") {
    val rows = graft.queries.TextOps.packChunks.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, chunks, straddlers) =
        (r.getAs[Long]("total_tokens"), r.getAs[Long]("n_chunks"),
         r.getAs[Long]("n_straddlers"))
      assert(chunks == (total + 2047) / 2048)
      // a doc can straddle at most all interior boundaries
      assert(straddlers >= 0 && straddlers < chunks)
    }
  }
}
