package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank
import graft.model.Tables

class GlobalRankSpec extends SparkSpec {

  test("distributed global rank equals the single-partition window rank") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val sortCols = Seq(col("o_totalprice"), col("o_orderkey"))
    val dist = GlobalRank.withGlobalRank(o, sortCols, "r")
    val single = o.withColumn("r2",
      row_number().over(Window.orderBy(sortCols: _*)).cast("long"))
    val joined = dist.join(single, Seq("o_orderkey", "o_totalprice"))
    assert(joined.filter(col("r") =!= col("r2")).count() === 0)
    assert(joined.count() === o.count())
  }

  test("ntileExact matches SQL ntile, including uneven tile sizes") {
    val s = spark
    import s.implicits._
    // 10 rows, 4 tiles -> sizes 3,3,2,2
    val df = (1 to 10).map(i => (i.toLong, i * 10)).toDF("id", "v")
    val got = GlobalRank.ntileExact(df, 4, Seq(col("v"), col("id")))
      .select("id", "tile").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.select(col("id"),
        ntile(4).over(Window.orderBy(col("v"), col("id"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got === want)
  }

  test("no single-partition window operator in the distributed plan") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val plan = GlobalRank.withGlobalRank(
      o, Seq(col("o_totalprice"), col("o_orderkey"))).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no WindowExec:\n$plan")
  }

  test("narrow keyCols path: identical ranks on a wide table, text column off the RDD hop") {
    // documents carries the wide `text` column — exactly the shape
    // where ranking full rows through the Row-level hop hurts
    val d = Tables.documents(spark, sf)
      .select("doc_id", "n_chars", "text", "lang", "source")
    val sortCols = Seq(col("n_chars"), col("doc_id"))
    val narrow = GlobalRank.withGlobalRank(d, sortCols, "r", keyCols = Seq("doc_id"))
    val wide = GlobalRank.withGlobalRank(d, sortCols, "r2")
    val joined = narrow.join(wide.select("doc_id", "r2"), "doc_id")
    assert(joined.filter(col("r") =!= col("r2")).count() === 0)
    assert(narrow.count() === d.count())
    assert(narrow.columns.sorted === (d.columns :+ "r").sorted)
    // the RDD index hop's output (the ExistingRDD scan in the final
    // plan) must carry only key + sort + rank — never the text column
    val plan = narrow.queryExecution.executedPlan.toString
    val scanLines = plan.linesIterator.filter(_.contains("ExistingRDD")).toSeq
    assert(scanLines.nonEmpty, s"expected an ExistingRDD scan:\n$plan")
    assert(!scanLines.exists(_.contains("text")),
      s"text column rode the RDD index hop:\n${scanLines.mkString("\n")}")
  }

  test("narrow keyCols path fails loudly on a NULL key instead of dropping rows") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(1L), 10), (None: Option[Long], 20), (Some(3L), 30))
      .toDF("id", "v")
    val ex = intercept[org.apache.spark.SparkException] {
      GlobalRank.withGlobalRank(df, Seq(col("v"), col("id")), keyCols = Seq("id")).count()
    }
    // the contract violation must surface with its own message, not as
    // a generic NPE from the join
    assert(ex.getMessage.contains("keyCols contract")
      || Option(ex.getCause).exists(_.getMessage.contains("keyCols contract")),
      s"unexpected failure: $ex")
  }

  test("ranks at sf0.01 are a permutation of 1..N with equal ntile splits") {
    val o = Tables.orders(spark, "/root/testdata/sf0.01")
      .select("o_orderkey", "o_totalprice")
    val tiles = GlobalRank.ntileExact(o, 4, Seq(col("o_totalprice"), col("o_orderkey")))
      .groupBy("tile").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = o.count()
    assert(tiles.keySet === Set(1L, 2L, 3L, 4L))
    assert(tiles.values.sum === n)
    assert(tiles.values.max - tiles.values.min <= 1) // 15000/4 -> 3750 each
  }
}
