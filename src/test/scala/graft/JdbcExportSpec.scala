package graft

import org.apache.spark.sql.functions._
import graft.streaming.ProductViewPipeline

/** K6 (SURVEY §2.6): the JDBC export that replaces the reference's
  * Sqoop hop (dag_file.py:84-90). Exercised against in-process Derby —
  * the embedded JDBC engine Spark already ships for its Hive metastore
  * — so the export path runs for real in the zero-egress sandbox:
  * Spark's DerbyDialect DDL, batched INSERTs, and a read-back compare.
  */
class JdbcExportSpec extends SparkSpec {
  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("K6: windowed-count output round-trips through a JDBC table") {
    import spark.implicits._
    val out = Seq(("desktop", 42L), ("mobile-web", 17L), ("mobile-app", 8L))
      .toDF("source", "source_number")

    ProductViewPipeline.exportJdbc(out, url, "commerce")

    val back = spark.read.jdbc(url, "commerce", new java.util.Properties())
      .select(col("SOURCE").as("source"), col("SOURCE_NUMBER").as("source_number"))
    assert(back.count() == 3)
    val got = back.as[(String, Long)].collect().toSet
    assert(got == Set(("desktop", 42L), ("mobile-web", 17L), ("mobile-app", 8L)))

    // append mode appends, as the daily Airflow export would
    ProductViewPipeline.exportJdbc(out.limit(1), url, "commerce")
    assert(spark.read.jdbc(url, "commerce", new java.util.Properties()).count() == 4)
  }

  test("K6 streaming: update-mode windowed counts UPSERT into the JDBC table (no stale versions)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val c = java.sql.DriverManager.getConnection(url)
    // the PRIMARY KEY is part of the upsert contract, not decoration:
    // delete-then-insert is idempotent for sequential replays, and the
    // key is what serializes CONCURRENT duplicate attempts (the
    // jdbcUpsertQuery scaladoc's one residual case)
    c.createStatement().execute(
      "CREATE TABLE win_counts (start_ts TIMESTAMP NOT NULL, " +
        "source VARCHAR(32) NOT NULL, source_number BIGINT, " +
        "PRIMARY KEY (start_ts, source))")
    c.close()

    def rec(ts: String, source: String): String =
      s"""{"event":"ProductView","messageid":"${java.util.UUID.randomUUID()}","userid":"user-1",""" +
      s""""properties":{"productid":"product-1"},"context":{"source":"$source"},""" +
      s""""timestamp":"$ts"}"""

    val in = MemoryStream[String]
    val counts = ProductViewPipeline.windowedCounts(
      ProductViewPipeline.parse(in.toDF()))
    val dir = java.nio.file.Files.createTempDirectory("graft_jdbc_up").toString
    val q = ProductViewPipeline.jdbcUpsertQuery(counts, url, "win_counts", dir,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      in.addData(rec("2021-03-07 19:01:00", "desktop"),
                 rec("2021-03-07 19:02:00", "desktop"))
      q.processAllAvailable()
      // same window grows: update mode re-emits it; the sink must
      // OVERWRITE the key, not append a second version
      in.addData(rec("2021-03-07 19:03:00", "desktop"),
                 rec("2021-03-07 19:02:30", "mobile-web"))
      q.processAllAvailable()
      val back = spark.read.jdbc(url, "win_counts", new java.util.Properties())
        .select(col("SOURCE").as("source"), col("SOURCE_NUMBER").as("n"))
        .as[(String, Long)].collect().toMap
      assert(back == Map("desktop" -> 3L, "mobile-web" -> 1L),
        s"expected upserted latest counts, got $back")
    } finally q.stop()
  }

  test("K6 streaming upsert diverts NULL-key groups instead of dying on the PK (poison-pill class)") {
    // r16 verdict task 7: the upsert path had never seen a null-bearing
    // batch. A record whose context carries no source parses to a NULL
    // source; windowedCounts emits a NULL-key group; the target's
    // PRIMARY KEY is NOT NULL — before the r17 divert, that row made
    // the INSERT throw, the batch roll back, and the checkpoint replay
    // the crash forever. Contract now: null-key rows are diverted
    // (logged loudly), valid rows in the SAME batch still commit.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().execute(
      "CREATE TABLE win_counts_n (start_ts TIMESTAMP NOT NULL, " +
        "source VARCHAR(32) NOT NULL, source_number BIGINT, " +
        "PRIMARY KEY (start_ts, source))")
    c.close()

    def rec(ts: String, ctx: String): String =
      s"""{"event":"ProductView","messageid":"${java.util.UUID.randomUUID()}","userid":"user-1",""" +
      s""""properties":{"productid":"product-1"},"context":$ctx,""" +
      s""""timestamp":"$ts"}"""

    val in = MemoryStream[String]
    val counts = ProductViewPipeline.windowedCounts(
      ProductViewPipeline.parse(in.toDF()))
    val dir = java.nio.file.Files.createTempDirectory("graft_jdbc_null").toString
    val q = ProductViewPipeline.jdbcUpsertQuery(counts, url, "win_counts_n", dir,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      // one NULL-source record IN THE SAME BATCH as valid rows: the
      // valid rows must commit, the null-key group must be diverted
      in.addData(rec("2021-03-07 19:01:00", """{"source":"desktop"}"""),
                 rec("2021-03-07 19:02:00", """{}"""),
                 rec("2021-03-07 19:02:30", """{"source":"mobile-web"}"""))
      q.processAllAvailable()
      assert(q.isActive, "upsert query died on the null-key group")
      val back = spark.read.jdbc(url, "win_counts_n", new java.util.Properties())
        .select(col("SOURCE").as("source"), col("SOURCE_NUMBER").as("n"))
        .as[(String, Long)].collect().toMap
      assert(back == Map("desktop" -> 1L, "mobile-web" -> 1L),
        s"valid rows must survive a null-key sibling, got $back")
      // the null group keeps flowing on later batches without poisoning
      in.addData(rec("2021-03-07 19:03:00", """{"source":"desktop"}"""))
      q.processAllAvailable()
      assert(q.isActive)
      val back2 = spark.read.jdbc(url, "win_counts_n", new java.util.Properties())
        .select(col("SOURCE").as("source"), col("SOURCE_NUMBER").as("n"))
        .as[(String, Long)].collect().toMap
      assert(back2 == Map("desktop" -> 2L, "mobile-web" -> 1L), s"got $back2")
    } finally q.stop()
  }
}
