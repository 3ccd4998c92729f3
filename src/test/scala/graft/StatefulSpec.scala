package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{ProductViewPipeline => P, Stateful}

/** flatMapGroupsWithState sessionization + stream-stream join
  * semantics over MemoryStream with controlled event-time. */
class StatefulSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private var n = 0
  private def tmp(): String = { n += 1; Files.createTempDirectory(s"graftst$n").toString }

  private def rec(user: String, ts: String, source: String = "desktop"): String =
    s"""{"event":"ProductView","messageid":"${java.util.UUID.randomUUID()}","userid":"$user",""" +
    s""""properties":{"productid":"product-1"},"context":{"source":"$source"},""" +
    s""""timestamp":"$ts"}"""

  test("sessionization closes a session after the event-time gap and keeps O(1) state") {
    val in = MemoryStream[String]
    val sessions = Stateful.userSessions(P.parse(in.toDF()),
      gapMs = 5 * 60 * 1000L, watermarkDelay = "1 minute")
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sess").option("checkpointLocation", tmp()).start()
    try {
      // user-1: two events 2 min apart (one session), then nothing
      in.addData(rec("user-1", "2021-03-07 19:00:00"), rec("user-1", "2021-03-07 19:02:00"))
      q.processAllAvailable()
      // advance watermark far past the session gap via another user
      in.addData(rec("user-2", "2021-03-07 20:00:00"))
      q.processAllAvailable()
      in.addData(rec("user-2", "2021-03-07 21:00:00"))
      q.processAllAvailable()
      val rows = spark.table("sess").filter(col("userid") === "user-1")
        .select("nEvents", "durationS").as[(Long, Long)].collect()
      assert(rows.toSeq === Seq((2L, 120L)), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("sessionization (flatMapGroupsWithState) runs on the RocksDB state store") {
    // SCALE.md's claim that RocksDB is the drop-in for state beyond
    // heap must hold for the CUSTOM-state path too, not just the
    // built-in windowed agg (ScalePathSpec) and transformWithState
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[String]
      val sessions = Stateful.userSessions(P.parse(in.toDF()),
        gapMs = 5 * 60 * 1000L, watermarkDelay = "1 minute")
      val q = sessions.writeStream.outputMode("append").format("memory")
        .queryName("sess_rocks").option("checkpointLocation", tmp()).start()
      try {
        in.addData(rec("user-1", "2021-03-07 19:00:00"), rec("user-1", "2021-03-07 19:02:00"))
        q.processAllAvailable()
        in.addData(rec("user-2", "2021-03-07 20:00:00"))
        q.processAllAvailable()
        in.addData(rec("user-2", "2021-03-07 21:00:00"))
        q.processAllAvailable()
        // same answer as the default-provider run of the same lineage
        val rows = spark.table("sess_rocks").filter(col("userid") === "user-1")
          .select("nEvents", "durationS").as[(Long, Long)].collect()
        assert(rows.toSeq === Seq((2L, 120L)), s"got ${rows.toSeq}")
        val stateOps = q.lastProgress.stateOperators
        assert(stateOps.nonEmpty &&
          stateOps.forall(_.customMetrics.containsKey("rocksdbFilesCopied")),
          "session state operator is not RocksDB-backed")
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("built-in streaming session_window agrees with the custom fMGWS sessionization and its batch twin") {
    // the native MergingSessionsExec path: same [ts, ts+gap) semantics
    // as Stateful.userSessions (window end = lastTs + gap where
    // userSessions reports lastTs), finalized in append mode when the
    // watermark passes the window END. Three-way parity: streaming
    // session_window == streaming fMGWS == batch session_window over
    // the same events.
    val in = MemoryStream[String]
    val events = Seq(
      rec("user-sw", "2021-03-07 19:00:00"), rec("user-sw", "2021-03-07 19:02:00"),
      rec("user-sw", "2021-03-07 19:30:00"), // 28 min > 5 min gap: new session
      rec("user-sw2", "2021-03-07 19:01:00"))
    val gap = "5 minutes"
    val native = Stateful.sessionWindowCounts(P.parse(in.toDF()),
      gap = gap, watermarkDelay = "1 minute")
    val q = native.writeStream.outputMode("append").format("memory")
      .queryName("sess_native").option("checkpointLocation", tmp()).start()
    val inF = MemoryStream[String]
    val fmgws = Stateful.userSessions(P.parse(inF.toDF()),
      gapMs = 5 * 60 * 1000L, watermarkDelay = "1 minute")
    val qF = fmgws.writeStream.outputMode("append").format("memory")
      .queryName("sess_fmgws").option("checkpointLocation", tmp()).start()
    try {
      in.addData(events: _*); inF.addData(events: _*)
      q.processAllAvailable(); qF.processAllAvailable()
      // advance both watermarks far past every session end
      val closer = rec("user-adv", "2021-03-07 21:00:00")
      val closer2 = rec("user-adv", "2021-03-07 22:00:00")
      in.addData(closer); inF.addData(closer)
      q.processAllAvailable(); qF.processAllAvailable()
      in.addData(closer2); inF.addData(closer2)
      q.processAllAvailable(); qF.processAllAvailable()
      val nat = spark.table("sess_native")
        .filter(col("userid").startsWith("user-sw"))
        .select(col("userid"), col("start").cast("long"),
                col("end").cast("long"), col("n_events"))
        .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      val fm = spark.table("sess_fmgws")
        .filter(col("userid").startsWith("user-sw"))
        .select(col("userid"), col("start").cast("long"),
                // fMGWS end = lastTs; native end = lastTs + gap
                (col("end").cast("long") + 300L), col("nEvents"))
        .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(nat.nonEmpty && nat === fm,
        s"native session_window $nat != fMGWS-derived $fm")
      // batch twin over the same parsed rows (the q_session_windows
      // lineage, which the DuckDB gap-and-islands oracle checks)
      val batch = P.parse(events.toDF("value"))
        .groupBy(col("userid"), session_window(col("timestamp"), gap))
        .agg(count(lit(1)).as("n_events"))
        .select(col("userid"), col("session_window.start").cast("long"),
                col("session_window.end").cast("long"), col("n_events"))
        .filter(col("userid").startsWith("user-sw"))
        .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(nat === batch, s"streaming $nat != batch $batch")
    } finally { q.stop(); qF.stop() }
  }

  test("session gap boundary: events EXACTLY gap apart MERGE in both engines (inclusive boundary)") {
    // writing this test found a real bug: the built-in session_window
    // MERGES an event landing exactly on lastTs + gap (inclusive
    // boundary — batch-verified too), while userSessions' fold and
    // the q_session_windows DuckDB oracle both encoded the opposite
    // strict boundary. Both were fixed to the built-in's semantics in
    // r10; this test pins the reconciled boundary so a strictness
    // regression on any of the three surfaces flips it.
    val events = Seq(
      rec("user-gb", "2021-03-07 19:00:00"),
      rec("user-gb", "2021-03-07 19:05:00"), // exactly gap later: merges
      rec("user-gb", "2021-03-07 19:07:00")) // 2 min after: merges
    val in = MemoryStream[String]
    val native = Stateful.sessionWindowCounts(P.parse(in.toDF()),
      gap = "5 minutes", watermarkDelay = "1 minute")
    val q = native.writeStream.outputMode("append").format("memory")
      .queryName("sess_gb").option("checkpointLocation", tmp()).start()
    val inF = MemoryStream[String]
    val fmgws = Stateful.userSessions(P.parse(inF.toDF()),
      gapMs = 5 * 60 * 1000L, watermarkDelay = "1 minute")
    val qF = fmgws.writeStream.outputMode("append").format("memory")
      .queryName("sess_gbf").option("checkpointLocation", tmp()).start()
    try {
      in.addData(events: _*); inF.addData(events: _*)
      q.processAllAvailable(); qF.processAllAvailable()
      for (closer <- Seq(rec("user-adv2", "2021-03-07 21:00:00"),
                         rec("user-adv2", "2021-03-07 22:00:00"))) {
        in.addData(closer); inF.addData(closer)
        q.processAllAvailable(); qF.processAllAvailable()
      }
      val nat = spark.table("sess_gb").filter(col("userid") === "user-gb")
        .select(col("start").cast("long"), col("n_events"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      val fm = spark.table("sess_gbf").filter(col("userid") === "user-gb")
        .select(col("start").cast("long"), col("nEvents"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      // ONE session of all three events: the exact-gap event extends it
      assert(nat.map(_._2) === Seq(3L), s"native sessions: $nat")
      assert(nat === fm, s"native $nat != fMGWS $fm at the gap boundary")
    } finally { q.stop(); qF.stop() }
  }

  test("in-batch gap splits into two sessions; only the watermark-finalized one emits") {
    val in = MemoryStream[String]
    val sessions = Stateful.userSessions(P.parse(in.toDF()),
      gapMs = 5 * 60 * 1000L, watermarkDelay = "1 minute")
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sess2").option("checkpointLocation", tmp()).start()
    try {
      // 19:00 and 19:30 in ONE batch: 30 min > 5 min gap -> two sessions
      in.addData(rec("user-3", "2021-03-07 19:00:00"), rec("user-3", "2021-03-07 19:30:00"))
      q.processAllAvailable()
      // advance the watermark past the FIRST session's end+gap (19:05)
      // but not the second's (19:35): only the first may emit — a
      // straggler could still bridge into the 19:30 session
      in.addData(rec("user-8", "2021-03-07 19:10:00"))
      q.processAllAvailable()
      in.addData(rec("user-8", "2021-03-07 19:12:00"))
      q.processAllAvailable()
      val rows = spark.table("sess2").filter(col("userid") === "user-3")
        .select("nEvents").as[Long].collect()
      assert(rows.toSeq === Seq(1L), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("cross-batch out-of-order event cannot move session state backwards") {
    val in = MemoryStream[String]
    val sessions = Stateful.userSessions(P.parse(in.toDF()),
      gapMs = 5 * 60 * 1000L, watermarkDelay = "10 minutes")
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sess3").option("checkpointLocation", tmp()).start()
    try {
      in.addData(rec("user-4", "2021-03-07 19:02:00"))
      q.processAllAvailable()
      // later batch, EARLIER event (still above the 10-min watermark):
      // must extend the session backwards, not overwrite lastTs
      in.addData(rec("user-4", "2021-03-07 19:00:00"))
      q.processAllAvailable()
      // close it by advancing the watermark with another user
      in.addData(rec("user-9", "2021-03-07 21:00:00"))
      q.processAllAvailable()
      in.addData(rec("user-9", "2021-03-07 22:00:00"))
      q.processAllAvailable()
      val rows = spark.table("sess3").filter(col("userid") === "user-4")
        .select("nEvents", "durationS").as[(Long, Long)].collect()
      assert(rows.toSeq === Seq((2L, 120L)), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("an above-watermark straggler bridges a previously-split gap into one session") {
    val in = MemoryStream[String]
    val sessions = Stateful.userSessions(P.parse(in.toDF()),
      gapMs = 5 * 60 * 1000L, watermarkDelay = "30 minutes")
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sess5").option("checkpointLocation", tmp()).start()
    try {
      // 8-min in-batch gap -> two unfinalized intervals held in state
      in.addData(rec("user-6", "2021-03-07 19:00:00"), rec("user-6", "2021-03-07 19:08:00"))
      q.processAllAvailable()
      // 19:04 is above the watermark and within gap of BOTH intervals:
      // it must fuse them into one 3-event session — the reason split
      // intervals stay in state until the watermark releases them
      in.addData(rec("user-6", "2021-03-07 19:04:00"))
      q.processAllAvailable()
      in.addData(rec("user-9", "2021-03-07 21:00:00"))
      q.processAllAvailable()
      in.addData(rec("user-9", "2021-03-07 22:00:00"))
      q.processAllAvailable()
      val rows = spark.table("sess5").filter(col("userid") === "user-6")
        .select("nEvents", "durationS").as[(Long, Long)].collect()
      assert(rows.toSeq === Seq((3L, 480L)), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("a straggler gap-separated BEFORE the session start becomes its own session") {
    val in = MemoryStream[String]
    val sessions = Stateful.userSessions(P.parse(in.toDF()),
      gapMs = 5 * 60 * 1000L, watermarkDelay = "30 minutes")
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sess4").option("checkpointLocation", tmp()).start()
    try {
      in.addData(rec("user-5", "2021-03-07 19:20:00"))
      q.processAllAvailable()
      // 19 min older than the session start (> 5-min gap), still above
      // the 30-min watermark: must NOT stretch the 19:20 session back —
      // it belongs to an earlier, already-gap-closed session and emits
      // as its own single-event session
      in.addData(rec("user-5", "2021-03-07 19:01:00"))
      q.processAllAvailable()
      // close the live session by advancing the watermark
      in.addData(rec("user-9", "2021-03-07 21:00:00"))
      q.processAllAvailable()
      in.addData(rec("user-9", "2021-03-07 22:00:00"))
      q.processAllAvailable()
      val rows = spark.table("sess4").filter(col("userid") === "user-5")
        .select("nEvents", "durationS").as[(Long, Long)].collect().sorted
      assert(rows.toSeq === Seq((1L, 0L), (1L, 0L)), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("stream-stream join matches purchases within the delay bound only") {
    val views = MemoryStream[String]
    val purchases = MemoryStream[String]
    val joined = Stateful.viewToPurchaseJoin(
      P.parse(views.toDF()), P.parse(purchases.toDF()),
      watermark = "1 minute", maxDelay = "30 minutes")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj").option("checkpointLocation", tmp()).start()
    try {
      views.addData(rec("user-1", "2021-03-07 19:00:00"))
      purchases.addData(
        rec("user-1", "2021-03-07 19:10:00"), // within 30 min -> match
        rec("user-1", "2021-03-07 19:45:00"), // beyond 30 min -> no match
        rec("user-2", "2021-03-07 19:05:00")) // different user -> no match
      q.processAllAvailable()
      val rows = spark.table("ssj").select("v_user", "purchase_ts")
        .as[(String, java.sql.Timestamp)].collect()
      assert(rows.toSeq === Seq(("user-1",
        java.sql.Timestamp.valueOf("2021-03-07 19:10:00"))), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched views with nulls after watermark") {
    val views = MemoryStream[String]
    val purchases = MemoryStream[String]
    val joined = Stateful.viewToPurchaseJoin(
      P.parse(views.toDF()), P.parse(purchases.toDF()),
      watermark = "1 minute", maxDelay = "30 minutes", joinType = "left_outer")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssjlo").option("checkpointLocation", tmp()).start()
    try {
      views.addData(rec("user-1", "2021-03-07 19:00:00"),  // will match
                    rec("user-3", "2021-03-07 19:00:00"))  // never matches
      purchases.addData(rec("user-1", "2021-03-07 19:10:00"))
      q.processAllAvailable()
      // the unmatched view may only emit once BOTH watermarks pass its
      // match window (view_ts + 30 min + 1 min delay): advance them
      views.addData(rec("user-9", "2021-03-07 21:00:00"))
      purchases.addData(rec("user-9", "2021-03-07 21:00:01"))
      q.processAllAvailable()
      val rows = spark.table("ssjlo")
        .select("v_user", "purchase_ts")
        .as[(String, Option[java.sql.Timestamp])].collect().toMap
      assert(rows("user-1").contains(java.sql.Timestamp.valueOf("2021-03-07 19:10:00")),
        s"matched view lost its purchase: $rows")
      assert(rows.contains("user-3") && rows("user-3").isEmpty,
        s"unmatched view did not emit with null purchase: $rows")
    } finally q.stop()
  }

  test("transformWithState accumulates per-user lifetime counts across batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[String]
      val profiles = Stateful.userProfiles(P.parse(in.toDF()))
      val q = profiles.writeStream.outputMode("update").format("memory")
        .queryName("profiles").option("checkpointLocation", tmp()).start()
      try {
        in.addData(rec("user-1", "2021-03-07 19:00:00"), rec("user-1", "2021-03-07 19:01:00"))
        q.processAllAvailable()
        in.addData(rec("user-1", "2021-03-07 19:02:00"), rec("user-2", "2021-03-07 19:02:00"))
        q.processAllAvailable()
        val latest = spark.table("profiles")
          .groupBy(col("userid")).agg(max(col("lifetime_views")).as("v"))
          .as[(String, Long)].collect().toMap
        assert(latest === Map("user-1" -> 3L, "user-2" -> 1L), s"got $latest")
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming session_window aggregation emits finalized sessions") {
    val in = MemoryStream[String]
    val agg = P.parse(in.toDF())
      .withWatermark("timestamp", "1 minute")
      .groupBy(col("userid"), session_window(col("timestamp"), "5 minutes"))
      .count()
      .select(col("userid"), col("session_window.start").as("start"),
              col("session_window.end").as("end"), col("count"))
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("swagg").option("checkpointLocation", tmp()).start()
    try {
      in.addData(rec("user-1", "2021-03-07 19:00:00"), rec("user-1", "2021-03-07 19:02:00"))
      q.processAllAvailable()
      in.addData(rec("user-9", "2021-03-07 20:00:00")) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("swagg").filter(col("userid") === "user-1")
        .select("count").as[Long].collect()
      assert(rows.toSeq === Seq(2L), s"got ${rows.toSeq}")
    } finally q.stop()
  }
}
