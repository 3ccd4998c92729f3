package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** DuckDB's Arrow output uses naive timestamp[us]; Spark's
    * TimestampType reads back as timestamp[us, tz=UTC] — same instant,
    * different Arrow schema, which fails the driver's byte-level
    * compare. Session tz is UTC, so the ntz cast is value-identity;
    * applied here once instead of in every query so the engine-side
    * plans keep real (instant-semantics) timestamps. */
  /** TimestampType -> TimestampNTZType at ANY nesting depth (a window
    * struct's start/end would otherwise keep the tz'd Arrow type). */
  private def ntz(dt: DataType): DataType = dt match {
    case TimestampType => TimestampNTZType
    case s: StructType =>
      StructType(s.fields.map(f => f.copy(dataType = ntz(f.dataType))))
    case a: ArrayType  => a.copy(elementType = ntz(a.elementType))
    case m: MapType    => m.copy(keyType = ntz(m.keyType), valueType = ntz(m.valueType))
    case other         => other
  }

  private[graft] def tzNormalize(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val target = ntz(f.dataType)
      if (target == f.dataType) col(f.name)
      else col(f.name).cast(target).as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing query names: dump only those (fast iteration)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // write µs timestamps (not INT96) so DuckDB reads the same type
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // stale-output guard: a query that fails BEFORE its overwrite-write
    // executes (e.g. an AnalysisException at plan time) must not leave
    // a previous run's parquet behind for the checker to green-light.
    // The wipe THROWS on failure (r17 ADVICE: a log-only wipe failure —
    // permissions, open handle — let the guard proceed and risk a stale
    // green, the exact outcome it exists to prevent); the throw lands
    // in this query's catch, so the query fails loudly (dir absent →
    // driver records err via names.json) and the battery continues.
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.nonEmpty && !only.contains(name)) ()
      else {
        // isolate queries, same rule as Bench: several queries persist
        // internal relations by design (dedupClusters, curationFunnel,
        // exactSubstring, heavyHitters) — a leftover block must not
        // occupy this local[4] JVM for the rest of the full battery
        spark.catalog.clearCache()
        try {
          graft.model.Fs.wipeOrThrow(s"$outDir/$name")
          tzNormalize(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          if (!graft.model.Fs.deleteRecursively(new java.io.File(s"$outDir/$name"))) {
            // both the write and the cleanup wipe failed: whatever
            // survives in the dir is NOT this run's result. A stderr
            // line alone is not machine-visible (r18 review) — the
            // dir-presence gate would see a complete-looking dir of
            // the PREVIOUS run's parquet and the compare could
            // green-light it. Poison the dir with an unreadable
            // .parquet member so any parquet read of it fails loudly.
            System.err.println(
              s"[verify] CRITICAL: $name cleanup wipe failed — output dir may hold a STALE previous result")
            try Files.writeString(
              Paths.get(s"$outDir/$name/stale_poison.parquet"),
              "NOT PARQUET — stale-output guard poison (see [verify] CRITICAL above)")
            catch { case p: Throwable => System.err.println(
              s"[verify] CRITICAL: $name poison write also failed: ${p.getMessage}") }
          }
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // manifest of every registered query, so the local gate can FAIL
    // on a query that crashed (its output dir is simply absent — a
    // glob over dirs alone would silently skip it)
    Files.writeString(Paths.get(s"$outDir/names.json"),
      SparkEntry.queries.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
