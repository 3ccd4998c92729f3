package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{ProductViewPipeline => P}

/** The two mechanisms that carry this engine from local[32] to a
  * 1000-executor cluster: bucketed co-located joins (shuffle
  * elimination for repeated fact-fact joins) and the RocksDB state
  * store (streaming state larger than executor heap). */
class ScalePathSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("bucketed tables join without an exchange on the bucket key") {
    val wh = Files.createTempDirectory("graftwh").toString
    val li = graft.model.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
    val o = graft.model.Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_b").mode("overwrite").saveAsTable("o_b")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      joined.write.format("noop").mode("overwrite").save()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === li.join(o,
        col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("hive-style partitioned output prunes partitions at read time") {
    // the training-data layout: corpus sharded by language so a
    // per-language consumer reads only its shard — at 100 TB the
    // difference between scanning 1/5th of the files and all of them
    val dir = Files.createTempDirectory("graftpart").toString
    val docs = graft.model.Tables.documents(spark, sf)
    docs.write.partitionBy("lang").mode("overwrite").parquet(s"$dir/docs")
    val en = spark.read.parquet(s"$dir/docs").filter(col("lang") === "en")
    assert(en.count() === docs.filter(col("lang") === "en").count())
    // the lang predicate must be a partition filter (pruned before any
    // file is opened), not a post-scan data filter
    val scan = en.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      s"lang not pushed as a partition filter: ${scan.partitionFilters}")
    assert(scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files).forall(_.getPath.toString.contains("lang=en")),
      "pruned listing still contains non-en files")
  }

  test("AQE splits a skewed join partition at runtime (the built-in complement to salting)") {
    // q_salted_join spreads a hot key MANUALLY (compile-time salt);
    // AQE's skew-join is the runtime complement: after the shuffle,
    // one oversized partition is split into multiple tasks and the
    // other side's matching partition is replicated. Thresholds are
    // lowered so fixture-scale skew triggers the same mechanism a hot
    // key would at 100 TB — what's under test is that the engine's
    // session leaves AQE ON and the mechanism actually fires, not the
    // thresholds themselves.
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "200k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force a shuffle join: a broadcast dim would dodge the skew path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import spark.implicits._
      // 150k of 200k fact rows land on key 0, with an INCOMPRESSIBLE
      // ~96-byte payload (md5 hex — repeated literals would lz4 away
      // under the size threshold): one shuffle partition carries ~10
      // MB while the median carries a few hundred KB
      val fact = spark.range(0, 200000).select(
        when($"id" < 150000, 0L).otherwise(pmod($"id", lit(100L))).as("k"),
        concat(md5($"id".cast("string")), md5(($"id" + 1).cast("string")),
               md5(($"id" + 2).cast("string"))).as("payload"))
      val dim = spark.range(0, 100).select($"id".as("k"),
        concat(lit("name_"), $"id".cast("string")).as("name"))
      val j = fact.join(dim, "k")
      // collect() executes THIS frame's QueryExecution (a write or
      // count() builds a fresh one whose adaptive plan never
      // finalizes), so the skew markers are visible afterwards
      assert(j.collect().length === 200000, "skew-split join lost or duplicated rows")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not mark the skewed join partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side behind a selective dim filter") {
    // third leg of the runtime-pruning stool beside AQE skew-split and
    // partition pruning: a selective filter on one join side should
    // become a bloom-filter probe on the OTHER side's scan, so at 100 TB
    // the fact table drops non-joining rows before the shuffle instead
    // of shipping them. Thresholds are floored so fixture-scale tables
    // qualify; under test is that the session keeps the optimizer rule
    // live and the injected filter both appears and preserves results.
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // fixture scans are KBs, production default is 10GB/10MB gates
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
      // a broadcast join would dodge the runtime-filter path entirely
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val urgent = graft.model.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val li = graft.model.Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_quantity"))
      val j = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      val optimized = j.queryExecution.optimizedPlan.toString
      // Spark 4.1 spelling: creation side aggregates `bloom_filter_agg`
      // into a scalar subquery; the fact side probes it via `might_contain`
      assert(optimized.contains("might_contain")
               && optimized.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected on the fact side:\n$optimized")
      // the filter is a pre-shuffle reduction, never a semantics change:
      // count must equal the same join with the rule off
      val n = j.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(n === li.join(urgent, col("l_orderkey") === col("o_orderkey")).count(),
        "bloom-filtered join changed the result")
      assert(n > 0, "fixture join is empty — test is vacuous")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("windowed aggregation runs on the RocksDB state store") {
    val in = MemoryStream[String]
    val counts = P.windowedCounts(P.parse(in.toDF()))
    val chk = Files.createTempDirectory("graftrocks").toString
    val q = counts.writeStream.outputMode("update").format("memory")
      .queryName("rocks")
      .option("checkpointLocation", chk)
      .start()
    // provider is a per-query conf resolved at start; set via session
    // conf BEFORE start would race other tests — instead verify the
    // default run, then re-run the same pipeline with RocksDB in an
    // isolated conf scope below.
    try {
      in.addData(
        s"""{"event":"ProductView","messageid":"m1","userid":"u1","properties":{"productid":"p"},"context":{"source":"desktop"},"timestamp":"2021-03-07 19:01:00"}""")
      q.processAllAvailable()
      assert(spark.table("rocks").count() >= 1)
    } finally q.stop()

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in2 = MemoryStream[String]
    val counts2 = P.windowedCounts(P.parse(in2.toDF()))
    val q2 = counts2.writeStream.outputMode("update").format("memory")
      .queryName("rocks2")
      .option("checkpointLocation", Files.createTempDirectory("graftrocks2").toString)
      .start()
    try {
      in2.addData(
        s"""{"event":"ProductView","messageid":"m2","userid":"u1","properties":{"productid":"p"},"context":{"source":"desktop"},"timestamp":"2021-03-07 19:01:00"}""",
        s"""{"event":"ProductView","messageid":"m3","userid":"u2","properties":{"productid":"p"},"context":{"source":"mobile-app"},"timestamp":"2021-03-07 19:02:00"}""")
      q2.processAllAvailable()
      val rows = spark.table("rocks2")
        .select("source", "source_number").as[(String, Long)].collect().toMap
      assert(rows === Map("desktop" -> 1L, "mobile-app" -> 1L), s"got $rows")
      assert(q2.lastProgress.stateOperators.head.customMetrics
        .containsKey("rocksdbFilesCopied"),
        "state operator is not RocksDB-backed")
    } finally {
      q2.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
