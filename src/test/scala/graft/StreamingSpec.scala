package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{ProductViewPipeline => P, Simulator}

/** Streaming semantics (SURVEY.md §5.2): watermark late-drop,
  * update-mode re-emission, append-mode finalize-once, checkpoint
  * recovery, streaming dedup. These behaviors cannot be DuckDB-oracled
  * — MemoryStream with controlled event-time advancement is the test
  * surface.
  */
object StreamingSpec {
  /** (window start, source) -> latest state count seen via foreachBatch. */
  val recovered = new java.util.concurrent.ConcurrentHashMap[(java.sql.Timestamp, String), Long]()
}

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private var n = 0
  private def tmp(): String = { n += 1; Files.createTempDirectory(s"graft$n").toString }

  private def rec(ts: String, source: String, msgId: String = java.util.UUID.randomUUID().toString): String =
    s"""{"event":"ProductView","messageid":"$msgId","userid":"user-1",""" +
    s""""properties":{"productid":"product-1"},"context":{"source":"$source"},""" +
    s""""timestamp":"$ts"}"""

  private def startMemoryQuery(counts: DataFrame, name: String, mode: String) =
    counts.writeStream.outputMode(mode).format("memory").queryName(name)
      .option("checkpointLocation", tmp()).start()

  test("update mode re-emits a window with growing counts across batches") {
    val in = MemoryStream[String]
    val counts = P.windowedCounts(P.parse(in.toDF()))
    val q = startMemoryQuery(counts, "upd", "update")
    try {
      in.addData(rec("2021-03-07 19:01:00", "desktop"), rec("2021-03-07 19:02:00", "desktop"))
      q.processAllAvailable()
      in.addData(rec("2021-03-07 19:03:00", "desktop"))
      q.processAllAvailable()
      val rows = spark.table("upd")
        .filter(col("source") === "desktop")
        .select("source_number").as[Long].collect().sorted
      // same window emitted twice: first count 2, then updated count 3
      assert(rows.toSeq == Seq(2L, 3L), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("late events behind the watermark are dropped") {
    val in = MemoryStream[String]
    val counts = P.windowedCounts(P.parse(in.toDF()))
    val q = startMemoryQuery(counts, "late", "update")
    try {
      in.addData(rec("2021-03-07 19:01:00", "desktop"))
      q.processAllAvailable()
      // advance max event time to 19:30 -> watermark 19:25 after next batch
      in.addData(rec("2021-03-07 19:30:00", "desktop"))
      q.processAllAvailable()
      in.addData(rec("2021-03-07 19:02:00", "desktop")) // 23 min late, window closed
      q.processAllAvailable()
      val w1900 = spark.table("late")
        .filter(col("start") === lit("2021-03-07 19:00:00").cast("timestamp"))
        .select("source_number").as[Long].collect()
      assert(w1900.max == 1L, s"late event should be dropped, got counts ${w1900.toSeq}")
    } finally q.stop()
  }

  test("append-mode parquet sink emits only watermark-finalized windows, as (source, source_number)") {
    val srcDir = tmp(); val chk = tmp(); val out = tmp()
    def writeRecs(recs: String*): Unit =
      Files.writeString(Files.createTempFile(java.nio.file.Paths.get(srcDir), "drop", ".txt"),
        recs.mkString("\n"))
    writeRecs(rec("2021-03-07 19:01:00", "desktop"), rec("2021-03-07 19:02:00", "mobile-app"))
    def run(): Unit = {
      val counts = P.windowedCounts(P.parse(P.fileSource(spark, srcDir)))
      val q = P.parquetQuery(counts, out, chk, Trigger.AvailableNow())
      q.awaitTermination()
    }
    run()
    // nothing finalized yet (watermark has not passed 19:05)
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst == 0, s"windows emitted before watermark passed: $afterFirst")
    writeRecs(rec("2021-03-07 19:30:00", "desktop")) // pushes watermark past 19:05
    run()
    val finalized = spark.read.parquet(out)
    assert(finalized.columns.toSeq == Seq("source", "source_number"))
    val rows = finalized.as[(String, Long)].collect().toSet
    assert(rows == Set(("desktop", 1L), ("mobile-app", 1L)), s"got $rows")
  }

  test("checkpoint recovery: restart resumes without double-counting") {
    val srcDir = tmp(); val chk = tmp()
    val ev1 = graft.model.Tables.events(spark, sf).filter(col("event_id") < 500)
    val ev2 = graft.model.Tables.events(spark, sf).filter(col("event_id") >= 500)
    Simulator.writeFileDrops(ev1, srcDir)
    def run(): Unit = {
      val counts = P.windowedCounts(P.parse(P.fileSource(spark, srcDir, maxFilesPerTrigger = 2)))
      val q = counts.writeStream.outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach { r =>
            StreamingSpec.recovered.put(
              (r.getAs[java.sql.Timestamp]("start"), r.getAs[String]("source")),
              r.getAs[Long]("source_number"))
          }
        }
        .option("checkpointLocation", chk).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    Simulator.writeFileDrops(ev2, srcDir)
    run()
    // update-mode rows carry the full state count per key; the last
    // value per key must sum to every event counted exactly once
    val total = StreamingSpec.recovered.values().toArray.map(_.asInstanceOf[Long]).sum
    val expected = graft.model.Tables.events(spark, sf).count()
    assert(total == expected, s"checkpoint recovery double/under-counted: $total vs $expected")
  }

  test("dropDuplicatesWithinWatermark removes redelivered message ids") {
    val in = MemoryStream[String]
    val deduped = P.dedupedByMessageId(P.parse(in.toDF()))
    val q = startMemoryQuery(deduped.select("messageid", "source"), "dedup", "append")
    try {
      in.addData(rec("2021-03-07 19:01:00", "desktop", "m1"),
                 rec("2021-03-07 19:01:30", "desktop", "m1"), // redelivery
                 rec("2021-03-07 19:02:00", "mobile-web", "m2"))
      q.processAllAvailable()
      in.addData(rec("2021-03-07 19:03:00", "desktop", "m1")) // still within watermark
      q.processAllAvailable()
      val ids = spark.table("dedup").select("messageid").as[String].collect().toSeq
      assert(ids.sorted == Seq("m1", "m2"), s"got $ids")
    } finally q.stop()
  }

  test("stateful stages compose in any order under ONE pipeline watermark (no redefinition)") {
    // the first stateful stage owns the lateness budget; every later
    // stage must reuse it — Spark refuses a second withWatermark once
    // multiple stateful operators are enabled, so without the shared
    // withEventWatermark guard each of these chains fails at analysis
    val in = MemoryStream[String]
    val parsed = P.parse(in.toDF())
    val chains = Seq(
      "dedup->counts" -> P.windowedCounts(P.dedupedByContent(parsed)),
      "dedup->distinct" -> P.windowedDistinctUsers(P.dedupedByContent(parsed)),
      "msgid->content->counts" ->
        P.windowedCounts(P.dedupedByContent(P.dedupedByMessageId(parsed))))
    chains.foreach { case (name, df) =>
      val q = startMemoryQuery(df, s"chain_${name.replaceAll("[^a-z]", "_")}", "append")
      try {
        in.addData(rec("2021-03-07 19:01:00", "desktop", "m1"))
        q.processAllAvailable() // throws on watermark redefinition
      } finally q.stop()
    }
  }

  test("content dedup drops fresh-message-id redeliveries and evicts state at the watermark") {
    val in = MemoryStream[String]
    val deduped = P.dedupedByContent(P.parse(in.toDF()), "2 minutes")
    val q = startMemoryQuery(deduped.select("messageid", "source"), "cdedup", "append")
    try {
      // same content, three DIFFERENT message ids — message-id dedup
      // would pass all three; content dedup must keep exactly one
      in.addData(rec("2021-03-07 19:01:00", "desktop", "m1"),
                 rec("2021-03-07 19:01:00", "desktop", "m2"),
                 rec("2021-03-07 19:02:00", "mobile-web", "m3"))
      q.processAllAvailable()
      in.addData(rec("2021-03-07 19:01:00", "desktop", "m4")) // dup, still in state
      q.processAllAvailable()
      val first = spark.table("cdedup").select("messageid").as[String].collect().toSet
      assert(first == Set("m1", "m3"), s"got $first")
      // advance the watermark past 19:01/19:02 + 2 min, then send one
      // more batch so the evicting maintenance pass runs
      in.addData(rec("2021-03-07 19:30:00", "desktop", "m5"))
      q.processAllAvailable()
      in.addData(rec("2021-03-07 19:01:00", "desktop", "m6"), // late dup: dropped by lateness
                 rec("2021-03-07 19:31:00", "desktop", "m7"))
      q.processAllAvailable()
      val ids = spark.table("cdedup").select("messageid").as[String].collect().toSet
      assert(ids == Set("m1", "m3", "m5", "m7"), s"got $ids")
      // state is bounded by the watermark horizon, not all-events-ever:
      // 4 distinct keys entered state (m1, m3, m5, m7 contents); after
      // the watermark passed 19:01/19:02 those two keys must be gone
      val stateRows = q.recentProgress.reverse
        .flatMap(_.stateOperators).headOption.map(_.numRowsTotal)
      assert(stateRows.exists(_ <= 2),
        s"dedup state not evicted at the watermark: $stateRows rows")
    } finally q.stop()
  }

  test("observe() surfaces per-batch wire-quality metrics without extra jobs") {
    val in = MemoryStream[String]
    val observed = P.withWireMetrics(P.parse(in.toDF()))
    val q = startMemoryQuery(observed.select("messageid", "source"), "obs", "append")
    try {
      in.addData(
        rec("2021-03-07 19:01:00", "desktop", "m1"),
        rec("2021-03-07 19:02:00", "mobile-web", "m2"),
        // malformed timestamp -> parses to null, counted by n_bad_ts
        rec("not-a-timestamp", "desktop", "m3"))
      q.processAllAvailable()
      val m = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("wire_metrics"))).last
      assert(m.getAs[Long]("n_records") == 3L, s"n_records: $m")
      assert(m.getAs[Long]("n_bad_ts") == 1L, s"n_bad_ts: $m")
      assert(m.getAs[Long]("n_no_source") == 0L, s"n_no_source: $m")
    } finally q.stop()
  }

  test("dead-letter split quarantines malformed payloads with reason, raw preserved") {
    val in = MemoryStream[String]
    val goodDir = tmp(); val deadDir = tmp()
    val q = P.deadLetterQuery(P.parseWithRaw(in.toDF()), goodDir, deadDir,
      tmp(), Trigger.ProcessingTime(0))
    try {
      in.addData(
        rec("2021-03-07 19:01:00", "desktop", "m1"),
        rec("2021-03-07 19:02:00", "mobile-web", "m2"),
        "this is not json at all",
        // parseable JSON but no context.source field
        """{"event":"ProductView","messageid":"m4","timestamp":"2021-03-07 19:03:00"}""",
        rec("not-a-timestamp", "desktop", "m5"))
      q.processAllAvailable()
      val good = spark.read.parquet(goodDir)
      assert(good.count() == 2L)
      assert(good.select("messageid").as[String].collect().toSet == Set("m1", "m2"))
      assert(!good.columns.contains("raw_value"), "raw bytes leaked to the good path")
      val dead = spark.read.parquet(deadDir)
      val reasons = dead.select("reason").as[String].collect().sorted.toSeq
      assert(reasons == Seq("bad_timestamp", "malformed_json", "no_source"), s"got $reasons")
      // quarantine preserves the exact original payload for replay
      val raws = dead.select("raw_value").as[String].collect()
      assert(raws.contains("this is not json at all"))
      assert(raws.exists(_.contains("\"m5\"")))
    } finally q.stop()
  }

  test("foreachBatch emits each micro-batch globally sorted descending (v2 parity)") {
    val in = MemoryStream[String]
    val counts = P.windowedCounts(P.parse(in.toDF()))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val q = P.sortedBatchQuery(counts, tmp(), Trigger.ProcessingTime(0)) { (df, _) =>
      val batch = df.select("source_number").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSeq
      if (batch.nonEmpty) seen.synchronized { seen += batch }
    }
    try {
      in.addData(
        rec("2021-03-07 19:01:00", "desktop"), rec("2021-03-07 19:02:00", "desktop"),
        rec("2021-03-07 19:01:10", "mobile-app"), rec("2021-03-07 19:01:20", "mobile-web"),
        rec("2021-03-07 19:01:30", "mobile-web"), rec("2021-03-07 19:01:40", "mobile-web"))
      q.processAllAvailable()
      val batches = seen.synchronized(seen.toList)
      assert(batches.nonEmpty)
      batches.foreach(b => assert(b == b.sorted.reverse, s"batch not sorted desc: $b"))
      assert(batches.last.toSet == Set(3L, 2L, 1L))
    } finally q.stop()
  }

  test("W8: console + parquet sinks run concurrently from ONE lineage (v2 parity)") {
    val srcDir = tmp(); val out = tmp(); val chk = tmp()
    def writeRecs(recs: String*): Unit =
      Files.writeString(Files.createTempFile(java.nio.file.Paths.get(srcDir), "drop", ".txt"),
        recs.mkString("\n"))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    def runBoth(): Unit = {
      val counts = P.windowedCounts(P.parse(P.fileSource(spark, srcDir)))
      val (console, parquet) =
        P.dualSinkQueries(counts, out, chk, Trigger.AvailableNow()) { (df, _) =>
          val batch = df.select("source_number")
            .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSeq
          if (batch.nonEmpty) seen.synchronized { seen += batch }
        }
      // both queries are registered and live before either is awaited —
      // the reference's W8 shape (two writeStream.start() on one lineage)
      val ids = spark.streams.active.map(_.id).toSet
      assert(ids.contains(console.id) && ids.contains(parquet.id),
        "both sinks must run concurrently")
      console.awaitTermination()
      parquet.awaitTermination()
    }
    writeRecs(rec("2021-03-07 19:01:00", "desktop"), rec("2021-03-07 19:02:00", "desktop"),
              rec("2021-03-07 19:03:00", "mobile-app"))
    runBoth()
    writeRecs(rec("2021-03-07 19:30:00", "desktop")) // finalize the 19:00 window
    runBoth()
    // console side saw sorted update batches; parquet side has the
    // finalized window only
    assert(seen.synchronized(seen.nonEmpty))
    seen.synchronized(seen.toList).foreach(b =>
      assert(b == b.sorted.reverse, s"console batch not sorted desc: $b"))
    val finalized = spark.read.parquet(out).as[(String, Long)].collect().toSet
    assert(finalized == Set(("desktop", 2L), ("mobile-app", 1L)), s"got $finalized")
  }

  test("timestamp pattern parses both bare and .SSS+0000 wire formats") {
    val df = Seq(
      rec("2021-03-07 19:01:23", "desktop"),
      rec("2021-03-07 19:01:23.456+0000", "desktop")).toDF("value")
    val parsed = P.parse(df).select("timestamp").collect()
    assert(parsed.forall(_.get(0) != null), "explicit pattern must parse both wire formats")
  }

  test("external table registration over the streaming parquet output (K5)") {
    val dir = tmp()
    Seq(("desktop", 3L), ("mobile-app", 2L)).toDF("source", "source_number")
      .write.mode("overwrite").parquet(dir)
    P.registerExternalTable(spark, "commerce_test", dir)
    try {
      val rows = spark.sql("SELECT source, source_number FROM commerce_test ORDER BY source_number DESC")
        .as[(String, Long)].collect().toSeq
      assert(rows == Seq(("desktop", 3L), ("mobile-app", 2L)))
    } finally spark.sql("DROP TABLE IF EXISTS commerce_test")
  }
}
