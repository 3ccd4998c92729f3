package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{ProductViewPipeline => P, Simulator}

/** BASELINE.md throughput target: sustain >= 10,000 ev/s through the
  * windowed-count pipeline — 4 orders of magnitude over the
  * reference's 1 ev/s replay. Drives the FULL wire path (JSON wire
  * records -> parse -> watermark -> windowed count) through the file
  * stream source with one AvailableNow pass and measures end-to-end
  * wall time including source listing and sink commits. */
class ThroughputSpec extends SparkSpec {

  test("windowed-count pipeline sustains >= 10k events/sec end-to-end") {
    val nEvents = 100000L
    val srcDir = Files.createTempDirectory("graft-tp-src").toString
    // 100k wire-format events (the reference's full corpus size)
    val events = spark.range(nEvents).select(
      col("id").as("event_id"),
      (lit(1615000000L) + col("id") % 10800).cast("timestamp").as("ts"),
      (col("id") % 150).as("user_id"),
      element_at(array(lit("desktop"), lit("mobile-web"), lit("mobile-app")),
        (col("id") % 3 + 1).cast("int")).as("event_type"))
    Simulator.writeFileDrops(events, srcDir, numFiles = 8)

    val t0 = System.nanoTime()
    val counts = P.windowedCounts(P.parse(P.fileSource(spark, srcDir, maxFilesPerTrigger = 8)))
    val q = counts.writeStream
      .outputMode("update").format("memory").queryName("tp")
      .option("checkpointLocation", Files.createTempDirectory("graft-tp-chk").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val total = spark.table("tp").agg(sum("source_number")).head().getLong(0)
      assert(total === nEvents, s"lost events: $total != $nEvents")
      val rate = nEvents / secs
      info(f"pipeline throughput: $rate%.0f ev/s over $nEvents events (${secs}%.1f s)")
      assert(rate >= 10000.0, f"throughput $rate%.0f ev/s below the 10k target")
    } finally q.stop()
  }
}
