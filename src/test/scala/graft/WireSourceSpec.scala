package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.WireEvents

/** DataSource V2 wire source: round-trip fidelity, split-boundary
  * ownership, planning-time partition pruning, column pruning, and the
  * fail-loudly malformed-line contract.
  *
  * The pruning tests read evidence off the EXECUTED plan string — the
  * same `pushed=[...]` / `files=N` clause a plan reviewer sees in
  * `.explain` — so "the filter was pushed" is a printed fact, not an
  * assumption about connector internals.
  */
class WireSourceSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_wire").toString

  private lazy val events: DataFrame =
    graft.model.Tables.events(spark, sf)

  /** One wire dump shared by the read-side tests (writer runs once;
    * every test reads it independently). */
  private lazy val wireDir: String = {
    val d = tmp()
    WireEvents.writeWire(events, d)
    d
  }

  private def canon(df: DataFrame): Array[String] =
    df.select(col("event_id"), date_format(col("ts"), WireEvents.TsFmt),
              col("user_id"), col("event_type"), col("value").cast("string"),
              col("props"))
      .collect().map(_.mkString("")).sorted

  test("wire round-trip is lossless: every field, µs timestamps, JSON-in-JSON props") {
    val back = WireEvents.read(spark, wireDir)
      .withColumn("ts", to_timestamp(col("ts"), WireEvents.TsFmt))
    assert(canon(back) === canon(events))
  }

  test("byte-range splits partition the file without duplicating or losing straddled lines") {
    // 256-byte splits on ~150-byte lines: nearly every line straddles
    // or abuts a boundary, the worst case for ownership bookkeeping
    val split = WireEvents.read(spark, wireDir, maxSplitBytes = 256)
    val whole = WireEvents.read(spark, wireDir)
    assert(split.rdd.getNumPartitions > whole.rdd.getNumPartitions,
      "tiny maxSplitBytes must yield more input partitions")
    assert(canon(split.withColumn("ts", to_timestamp(col("ts"), WireEvents.TsFmt)))
      === canon(events))
  }

  test("event_type equality prunes partition directories at planning time") {
    val df = WireEvents.read(spark, wireDir).filter(col("event_type") === "purchase")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(event_type,purchase)") && plan.contains("pushed=["), plan)
    val all = WireEvents.read(spark, wireDir)
    val allFiles = "files=(\\d+)".r.findFirstMatchIn(
      all.queryExecution.executedPlan.toString).get.group(1).toInt
    val pruned = "files=(\\d+)".r.findFirstMatchIn(plan).get.group(1).toInt
    assert(pruned < allFiles,
      s"pruned scan must plan fewer files ($pruned vs $allFiles)")
    // and the surviving rows really are the one type, injected from the
    // directory name rather than parsed from any line
    assert(df.select(col("event_type")).distinct().collect().map(_.getString(0)).toSeq
      === Seq("purchase"))
    assert(df.count() === events.filter(col("event_type") === "purchase").count())
  }

  test("In-list pushdown plans only the listed directories") {
    val df = WireEvents.read(spark, wireDir)
      .filter(col("event_type").isin("click", "view"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[In(event_type"), plan)
    assert(df.count() ===
      events.filter(col("event_type").isin("click", "view")).count())
  }

  test("non-partition predicates stay residual (rows still filtered, no false pushdown claim)") {
    val df = WireEvents.read(spark, wireDir).filter(col("user_id") === 7L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("pushed=[EqualTo(user_id"), plan)
    assert(df.count() === events.filter(col("user_id") === 7L).count())
  }

  test("column pruning reaches the reader: scan materializes only requested fields") {
    val df = WireEvents.read(spark, wireDir).select(col("user_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=[user_id]"), plan)
    assert(df.distinct().count() ===
      events.select(col("user_id")).distinct().count())
  }

  test("a malformed wire line fails loudly with file and byte offset") {
    val d = tmp()
    WireEvents.writeWire(events.filter(col("event_id") < 100), d)
    val dir = Paths.get(d, "event_type=click")
    val victim = Files.list(dir).filter(p =>
      !p.getFileName.toString.startsWith("_") &&
      !p.getFileName.toString.startsWith(".")).findFirst().get()
    Files.writeString(victim,
      Files.readString(victim) + "{not json\n")
    // the Hadoop local FS keeps a `.name.crc` sidecar; editing the data
    // file without it makes the read fail on CHECKSUM, not on parse
    Files.deleteIfExists(dir.resolve("." + victim.getFileName.toString + ".crc"))
    val e = intercept[org.apache.spark.SparkException] {
      WireEvents.read(spark, d).count()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("malformed wire line"), msgs)
    assert(msgs.contains("offset"), msgs)
  }

  test("ServiceLoader registration resolves the short name") {
    val df = spark.read.format("wire-events")
      .option("path", wireDir).load()
    assert(df.schema === WireEvents.wireSchema)
  }

  test("SQL surface: CREATE TABLE USING wire-events answers SQL with pushdown intact") {
    spark.sql("DROP TABLE IF EXISTS wire_ev")
    spark.sql(
      s"CREATE TABLE wire_ev USING `wire-events` OPTIONS (path '$wireDir')")
    try {
      val df = spark.sql(
        "SELECT user_id, count(*) AS n FROM wire_ev " +
        "WHERE event_type = 'purchase' GROUP BY user_id")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("EqualTo(event_type,purchase)"), plan)
      val viaApi = WireEvents.read(spark, wireDir)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      assert(df.collect().map(_.toSeq).toSet === viaApi.collect().map(_.toSeq).toSet)
    } finally spark.sql("DROP TABLE IF EXISTS wire_ev")
  }

  test("micro-batch stream: census arrives once, new files arrive incrementally, restart is exactly-once") {
    val d = tmp()
    WireEvents.writeWire(events.filter(col("event_id") < 200), d)
    val chk = tmp()
    val got = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    def start() = spark.readStream
      .format(classOf[graft.sources.WireEventsSource].getName)
      .option("path", d).load()
      .writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.select(col("event_id")).collect().foreach(r => got.add(r.getLong(0)))
        ()
      }
      .start()

    val q = start()
    q.processAllAvailable()
    val n0 = got.size
    assert(n0 === events.filter(col("event_id") < 200).count())

    // a new file lands in a partition dir (immutable-once-visible, as a
    // writer's rename-into-place would) -> next batch carries ONLY it
    val dir = Paths.get(d, "event_type=click")
    val src = Files.list(dir).filter(p =>
      p.getFileName.toString.startsWith("part-")).findFirst().get()
    val perFile = Files.lines(src).count()
    assert(perFile > 0)
    Files.copy(src, dir.resolve("part-zz-extra1.txt"))
    q.processAllAvailable()
    assert(got.size === n0 + perFile)
    q.stop()

    // restart from the checkpoint with a file added while DOWN: exactly
    // the unseen file replays, nothing already-committed re-emits
    Files.copy(src, dir.resolve("part-zz-extra2.txt"))
    val q2 = start()
    q2.processAllAvailable()
    assert(got.size === n0 + 2 * perFile)
    q2.stop()
  }

  test("micro-batch stream with an event_type filter sees only that type's rows") {
    val d = tmp()
    WireEvents.writeWire(events.filter(col("event_id") < 200), d)
    var total = 0L
    val q = spark.readStream
      .format(classOf[graft.sources.WireEventsSource].getName)
      .option("path", d).load()
      .filter(col("event_type") === "purchase")
      .writeStream
      .option("checkpointLocation", tmp())
      .foreachBatch { (df: DataFrame, _: Long) =>
        total += df.count()
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(total ===
      events.filter(col("event_id") < 200 && col("event_type") === "purchase").count())
  }

  test("reported statistics shrink with pruning (cost model sees surviving bytes only)") {
    def scanBytes(df: DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    val all = WireEvents.read(spark, wireDir)
    val one = WireEvents.read(spark, wireDir)
      .filter(col("event_type") === "purchase")
    assert(scanBytes(one) < scanBytes(all),
      s"pruned stats ${scanBytes(one)} should be below full ${scanBytes(all)}")
  }
}
