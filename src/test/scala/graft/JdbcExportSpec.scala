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
}
