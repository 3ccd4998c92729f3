package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet: CSV, JSON-lines and ORC
  * round-trips of the events table (SURVEY §2.1 S3 generalized — the
  * reference ingests JSON files; a library user brings all three).
  * Each case asserts byte-level row equality against the parquet
  * source, plus the format-specific hazards: CSV needs an explicit
  * schema + timestamp format to survive the trip, JSON preserves µs
  * timestamps only through ISO-8601, ORC is the only one of the three
  * carrying a real schema of its own.
  */
class FormatsSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_fmt").toString

  /** events slice, µs-truncated timestamps (CSV/JSON render µs max),
    * sorted canonical form for comparison. */
  private def slice(): DataFrame =
    graft.model.Tables.events(spark, sf)
      .filter(col("event_id") < 500)
      .select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value"), col("props"))

  private def canon(df: DataFrame): Array[String] =
    df.select(col("event_id"), col("ts").cast("long").as("ts_us"),
        col("user_id"), col("event_type"),
        // value is a double: compare exact bits, not a rendering
        expr("cast(double(value) as string)").as("v"), col("props"))
      .collect().map(_.mkString("|")).sorted

  test("CSV round-trip with explicit schema preserves every field") {
    val dir = tmp()
    val src = slice()
    src.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val back = spark.read
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .schema(schema).csv(dir)
    assert(canon(back).sameElements(canon(src)), "CSV round-trip diverged")
  }

  test("JSON-lines round-trip preserves every field through ISO timestamps") {
    val dir = tmp()
    val src = slice()
    src.write.mode("overwrite").json(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val back = spark.read.schema(schema).json(dir)
    assert(canon(back).sameElements(canon(src)), "JSON round-trip diverged")
  }

  test("ORC round-trip preserves schema and rows without an explicit schema") {
    val dir = tmp()
    val src = slice()
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // ORC carries its own schema — assert it survived, then the rows
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"ORC schema drifted: ${back.schema}")
    assert(canon(back).sameElements(canon(src)), "ORC round-trip diverged")
  }

  /** The driver REGENERATES testdata between rounds and the physical
    * timestamp type has already changed once (TIMESTAMP(NANOS) ≤ r8 →
    * TIMESTAMP(MICROS) isAdjustedToUTC=false in r9). Tables.events
    * must normalize every generation to µs TimestampType with the
    * same values — this pins all three forms so the next regeneration
    * fails HERE, loudly, instead of as a fleet-wide
    * DATATYPE_MISMATCH. */
  test("Tables.events normalizes all three ts generations to identical µs timestamps") {
    val cur = graft.model.Tables.events(spark, sf).limit(200)
      .select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value"), col("props"))
    assert(cur.schema("ts").dataType == TimestampType,
      s"current fixture did not normalize: ${cur.schema("ts").dataType}")
    val want = cur.select(col("event_id"), expr("unix_micros(ts)"))
      .collect().map(_.mkString("|")).sorted

    def loaderSees(transformed: DataFrame): Array[String] = {
      val dir = tmp()
      transformed.write.mode("overwrite").parquet(s"$dir/events.parquet")
      val back = graft.model.Tables.events(spark, dir)
      assert(back.schema("ts").dataType == TimestampType,
        s"loader emitted ${back.schema("ts").dataType}")
      back.select(col("event_id"), expr("unix_micros(ts)"))
        .collect().map(_.mkString("|")).sorted
    }
    // ≤r8 generation: raw int64 nanoseconds (what TIMESTAMP(NANOS)
    // surfaces as under the legacy nanosAsLong conf)
    val nanos = loaderSees(cur.withColumn("ts", expr("unix_micros(ts) * 1000")))
    assert(nanos.sameElements(want), "nanos-as-long generation diverged")
    // r9 generation: TIMESTAMP_NTZ micros (isAdjustedToUTC=false)
    val ntzed = loaderSees(cur.withColumn("ts", col("ts").cast("timestamp_ntz")))
    assert(ntzed.sameElements(want), "NTZ-micros generation diverged")
    // hypothetical future generation: instant-semantics micros
    // (isAdjustedToUTC=true) — the pass-through arm
    val tzed = loaderSees(cur)
    assert(tzed.sameElements(want), "TZ-micros generation diverged")
  }

  /** Several oracles (multimodal features/resize, padding buckets)
    * equate characters with BYTES — valid only while documents.text is
    * pure ASCII. The assumption has held across every generation but
    * was only re-verified by hand (NOTES); this pins it so a non-ASCII
    * regeneration fails ONE focused test instead of hash-diverging a
    * scattered subset of the battery. */
  test("fixture contract: documents.text is pure ASCII, ids unique, keys non-null") {
    val d = graft.model.Tables.documents(spark, sf)
    val nonAscii = d.filter(expr("text RLIKE '[^\\\\x00-\\\\x7F]'")).count()
    assert(nonAscii == 0L,
      s"$nonAscii docs carry non-ASCII text — byte==char oracles are now wrong")
    assert(d.filter(col("lang").isNull || col("source").isNull ||
      col("text").isNull).count() == 0L)
    val n = d.count()
    assert(d.select(col("doc_id")).distinct().count() == n, "doc_id not unique")
    // n_chars really is the text length (padding/layout oracles rely on it)
    assert(d.filter(length(col("text")) =!= col("n_chars")).count() == 0L)
  }
}
