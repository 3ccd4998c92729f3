package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = {
    val s = spark
    import s.implicits._
    Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:05:00"), 101.0),
      ("B", ts("2024-01-01 10:03:00"), 50.0)
    ).toDF("sym", "qt", "px")
  }

  private lazy val trades = {
    val s = spark
    import s.implicits._
    Seq(
      ("A", ts("2024-01-01 10:04:59"), 1L), // between A quotes -> 100.0
      ("A", ts("2024-01-01 10:05:00"), 2L), // exactly on quote 2
      ("B", ts("2024-01-01 10:02:00"), 3L), // before any B quote
      ("C", ts("2024-01-01 10:00:00"), 4L)  // no C quotes at all
    ).toDF("sym", "tt", "trade_id")
  }

  test("backward as-of picks the latest quote at or before the trade (non-strict)") {
    val out = AsOfJoin.backward(trades, quotes,
        "sym", "tt", "sym", "qt", Seq("px"))
      .select("trade_id", "px").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 100.0, 2L -> 101.0)) // trade 3: no prior quote; trade 4: no key
  }

  test("strict mode excludes the same-timestamp quote") {
    val out = AsOfJoin.backward(trades, quotes,
        "sym", "tt", "sym", "qt", Seq("px"), strict = true)
      .select("trade_id", "px").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 100.0, 2L -> 100.0))
  }

  test("left join keeps unmatched trades with null quote") {
    val out = AsOfJoin.backward(trades, quotes,
        "sym", "tt", "sym", "qt", Seq("px"), joinType = "left")
    assert(out.count() === 4)
    assert(out.filter(col("px").isNull).select("trade_id")
      .collect().map(_.getLong(0)).toSet === Set(3L, 4L))
  }

  test("forward as-of picks the earliest quote at or after the trade") {
    val out = AsOfJoin.forward(trades, quotes,
        "sym", "tt", "sym", "qt", Seq("px"))
      .select("trade_id", "px").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // trade 1 -> next A quote 10:05 (101); trade 2 exactly on it
    // (non-strict); trade 3 -> B quote 10:03; trade 4: no key
    assert(out === Map(1L -> 101.0, 2L -> 101.0, 3L -> 50.0))
  }

  test("forward strict skips the same-timestamp quote") {
    val out = AsOfJoin.forward(trades, quotes,
        "sym", "tt", "sym", "qt", Seq("px"), strict = true)
      .select("trade_id", "px").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // trade 2 at exactly 10:05 must NOT match that quote, and A has
    // none later -> unmatched under inner
    assert(out === Map(1L -> 101.0, 3L -> 50.0))
  }

  test("tolerance turns a too-far match into no match") {
    // trade 3 at 10:02 -> B quote at 10:03 is 60s away: within 2
    // minutes, outside 30 seconds
    val within = AsOfJoin.forward(trades, quotes,
        "sym", "tt", "sym", "qt", Seq("px"), tolerance = Some("2 minutes"))
      .select("trade_id").collect().map(_.getLong(0)).toSet
    assert(within.contains(3L))
    val tight = AsOfJoin.forward(trades, quotes,
        "sym", "tt", "sym", "qt", Seq("px"), joinType = "left",
        tolerance = Some("30 seconds"))
    assert(tight.filter(col("trade_id") === 3L).head().isNullAt(
      tight.columns.indexOf("px")),
      "beyond-tolerance match must be null-extended under left join")
  }

  test("backward tolerance bounds the lookback distance") {
    // trade 1 at 10:04:59 -> quote at 10:00 is 299s back: inside 10
    // minutes, outside 1 minute (trade 2's quote is 0s back — always in)
    val wide = AsOfJoin.backward(trades, quotes,
        "sym", "tt", "sym", "qt", Seq("px"), tolerance = Some("10 minutes"))
      .select("trade_id").collect().map(_.getLong(0)).toSet
    assert(wide === Set(1L, 2L))
    val tight = AsOfJoin.backward(trades, quotes,
        "sym", "tt", "sym", "qt", Seq("px"), tolerance = Some("1 minute"))
      .select("trade_id").collect().map(_.getLong(0)).toSet
    assert(tight === Set(2L),
      s"backward tolerance failed to drop the 299s-old match: $tight")
  }

  test("plan shuffles once on the key — no nested-loop join") {
    val plan = AsOfJoin.backward(trades, quotes,
      "sym", "tt", "sym", "qt", Seq("px")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("Window"))
  }
}
