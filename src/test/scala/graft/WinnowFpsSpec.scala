package graft

import org.apache.spark.sql.functions._

import graft.queries.TextOps

/** Bit-equality of the compiled [[graft.functions.WinnowFps]] kernel
  * against the retired interpreted HOF spelling it replaced — the same
  * discipline as VectorExpressionsSpec: the kernel is only allowed to
  * be FASTER, never different. The HOF formulation is what the DuckDB
  * oracle mirrors, so kernel==HOF transitively preserves every
  * winnowing oracle hash.
  */
class WinnowFpsSpec extends SparkSpec {

  private def profiles(df: org.apache.spark.sql.DataFrame,
                       via: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : Map[Long, String] =
    via(df)
      .select(col("doc_id"), col("w.n_grams"), col("w.n_fingerprints"),
              col("w.fp_min"), col("w.fp_sum"), col("w.fps"))
      .collect()
      .map(r => r.getLong(0) -> r.mkString("|"))
      .toMap

  test("kernel matches the interpreted HOF on every fixture document") {
    val docs = graft.model.Tables.documents(spark, sf).select("doc_id", "text")
    val kernel = profiles(docs, TextOps.winnowFromText)
    val hof = profiles(docs, TextOps.winnowFromTextHof)
    assert(kernel.size == hof.size && kernel.size > 0)
    val diffs = kernel.collect { case (id, v) if hof(id) != v => (id, v, hof(id)) }
    assert(diffs.isEmpty, s"kernel diverges on ${diffs.take(3)}")
  }

  test("generated code actually COMPILES (no silent interpreted fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val e = graft.functions.WinnowFps(
      BoundReference(0, StringType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(e)) // throws on Janino failure
    // 7 words = exactly w+k-1: 4 shingles, 1 window, 1 fingerprint
    val out = proj(InternalRow(
      UTF8String.fromString("alpha bravo charlie delta echo foxtrot golf")))
    val s = out.getStruct(0, 5)
    assert(s.getLong(0) === 4L) // n_grams
    assert(s.getLong(1) === 1L) // n_fingerprints
    assert(s.getLong(2) === s.getArray(4).getLong(0)) // fp_min = the one fp
    assert(s.getLong(3) === s.getArray(4).getLong(0)) // fp_sum too
    val nul = proj(InternalRow(null))
    assert(nul.isNullAt(0))
  }

  test("winnow_fps stays inside whole-stage codegen") {
    val e = graft.model.Tables.documents(spark, sf)
      .select(graft.functions.WinnowFps.winnowFps(col("text")).as("w"))
    // the `*(n)` prefix marks a WholeStageCodegen span in the plan string
    val planLine = e.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("winnow_fps")).getOrElse("")
    assert(planLine.trim.startsWith("*("), s"winnow_fps not in a codegen span: $planLine")
  }

  test("kernel matches the HOF on degenerate and adversarial texts") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""),                                   // no words
      (2L, "   "),                                // only separators
      (3L, "one"),                                // < 4 words -> no shingles
      (4L, "one two three"),                      // still < 4
      (5L, "one two three four"),                 // exactly 1 shingle (< w windows)
      (6L, "one two three four five six seven"),  // exactly w+k-1 -> 1 fingerprint window
      (7L, "a  b   c    d e f g h i j"),          // consecutive spaces (empty tokens)
      (8L, ("tok " * 40).trim),                   // all-identical words -> duplicate minima
      (9L, "päivä säähän ylitse émigré naïve café touché cliché déjà vu encore"),
      (10L, "math 𝕊 symbol 𝄞 clef beyond the basic multilingual plane padding words here"),
      (11L, "punct!uation, mid-word; stays? part of: words 100% intact (period). end"),
      (12L, (1 to 60).map(i => s"w${i % 7}").mkString(" ")))  // periodic text, many dup minima
      .toDF("doc_id", "text")
    val kernel = profiles(docs, TextOps.winnowFromText)
    val hof = profiles(docs, TextOps.winnowFromTextHof)
    val diffs = kernel.keySet.collect { case id if hof(id) != kernel(id) =>
      (id, kernel(id), hof(id)) }
    assert(diffs.isEmpty, s"kernel diverges on $diffs")
  }
}
