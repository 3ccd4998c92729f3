package graft

import org.apache.spark.sql.functions._
import graft.functions.WireTimestamp.wireTimestamp

class WireTimestampSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "2021-03-07 19:01:23",             // bare (reference v1 parse target)
    "2021-03-07 19:01:23.456",         // millis only
    "2021-03-07 19:01:23.456+0000",    // NiFi wire format
    "2021-03-07 19:01:23+0000",        // offset only
    "2021-03-07 19:01:23.456+0530",    // non-UTC offset
    "2021-03-07 19:01:23.456-0800",
    "2021-03-07 19:01:23Z",
    "2024-02-29 00:00:00",             // leap day
    "1999-12-31 23:59:59.999",
    "2021-02-30 12:00:00",             // invalid civil date: lenient accept OR null, must MATCH to_timestamp
    "garbage",
    "2021-03-07T19:01:23",             // wrong separator
    "2021-13-01 00:00:00",             // bad month
    "2021-03-07 24:00:00",             // bad hour
    "2021-03-07 19:01:23.45",          // truncated fraction (2 digits)
    "2021-03-07 19:01:23.4",           // truncated fraction (1 digit)
    "2021-03-07 19:01:23.")            // bare dot, no fraction

  test("wire_timestamp equals to_timestamp with the bracketed pattern on every variant") {
    val df = samples.toDF("s").select(
      col("s"),
      wireTimestamp(col("s")).as("native"),
      try_to_timestamp(col("s"), lit("yyyy-MM-dd HH:mm:ss[.SSS][XX]")).as("builtin"))
    val diff = df.filter(
      (col("native").isNull =!= col("builtin").isNull) ||
      (col("native").isNotNull && col("native") =!= col("builtin")))
    assert(diff.count() === 0, s"divergent rows:\n${diff.collect().mkString("\n")}")
  }

  test("wire_timestamp stays inside whole-stage codegen") {
    // literal input would constant-fold into a LocalTableScan; use a
    // range-derived column so a real projection is planned
    val planLine = spark.range(100)
      .select(concat(lit("2021-03-07 19:01:"),
        lpad((col("id") % 60).cast("string"), 2, "0")).as("s"))
      .select(wireTimestamp(col("s")).as("t"))
      .queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("wire_timestamp")).getOrElse("")
    assert(planLine.trim.startsWith("*("), s"not in a codegen span: $planLine")
  }
}
