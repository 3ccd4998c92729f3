package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** text -> the complete MOSS winnowing profile in one compiled pass:
  * word-shingle hashes (k=4 word shingles over per-word base-131
  * poly-mod char hashes) and their w=4 window-min fingerprint set,
  * returned as the same struct the interpreted formulation emitted —
  * `(n_grams, n_fingerprints, fp_min, fp_sum, fps)`.
  *
  * Replaces the nested higher-order-function pipeline in
  * [[graft.queries.TextOps]] (split -> per-char aggregate -> shingle
  * fold -> window min -> array_distinct) that was the battery's
  * per-document CPU floor: every lambda there is a CodegenFallback
  * interpreted per ELEMENT (per character for the word hash), which
  * priced the scan at ~1 s per 500 docs. Here the whole profile is a
  * single static JVM method over the string — no per-element closure
  * dispatch, no intermediate arrays beyond the hash buffers — called
  * from inside whole-stage codegen.
  *
  * Value equivalence with the HOF spelling (and the DuckDB oracle's
  * `list_reduce` chain) is exact and spec-pinned:
  *  - words are maximal runs of non-space (0x20) characters — exactly
  *    `filter(split(text, ' '), t -> t <> '')`;
  *  - the word hash folds CODE POINTS (`ascii` of each `split(wd,'')`
  *    element is the code point; Java's empty-pattern split keeps
  *    surrogate pairs whole), `a = (a*131 + cp) mod 1e9+7` from 7;
  *  - the shingle hash folds 4 word hashes, `(b*1000003 + x) mod
  *    1e9+7` from 0; fewer than 4 words -> zero shingles;
  *  - fingerprints are the distinct 4-window minima in FIRST-OCCURRENCE
  *    order (`array_distinct`'s order), fewer than 4 shingles -> none;
  *  - `fp_min` is null on an empty fingerprint set (`array_min` of an
  *    empty array), `fp_sum` is a plain unreduced long sum (0 when
  *    empty).
  */
case class WinnowFps(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WinnowFps.structType
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {

  val structType: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_fingerprints", LongType, nullable = false),
    StructField("fp_min", LongType, nullable = true),
    StructField("fp_sum", LongType, nullable = false),
    StructField("fps", ArrayType(LongType, containsNull = false), nullable = false)))

  def winnowFps(text: Column): Column =
    ColumnBridge.column(WinnowFps(ColumnBridge.expression(text)))

  private val P = 1000000007L

  /** Called from generated code — must stay public + static-friendly. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    // per-word poly-mod hashes over code points
    var whs = new Array[Long](math.max(8, n / 6))
    var nw = 0
    var i = 0
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i < n) {
        var a = 7L
        while (i < n && s.charAt(i) != ' ') {
          val cp = s.codePointAt(i)
          a = (a * 131L + cp) % P
          i += Character.charCount(cp)
        }
        if (nw == whs.length) whs = java.util.Arrays.copyOf(whs, nw * 2)
        whs(nw) = a
        nw += 1
      }
    }
    // 4-word shingle hashes
    val nh = if (nw < 4) 0 else nw - 3
    val hs = new Array[Long](nh)
    var g = 0
    while (g < nh) {
      var b = 0L
      var j = g
      while (j < g + 4) { b = (b * 1000003L + whs(j)) % P; j += 1 }
      hs(g) = b
      g += 1
    }
    // distinct 4-window minima, first-occurrence order
    val nWin = if (nh < 4) 0 else nh - 3
    var fps = Array.emptyLongArray
    var nf = 0
    if (nWin > 0) {
      val seen = new java.util.HashSet[java.lang.Long](nWin * 2)
      fps = new Array[Long](nWin)
      var j = 0
      while (j < nWin) {
        var m = hs(j)
        var t = j + 1
        while (t < j + 4) { if (hs(t) < m) m = hs(t); t += 1 }
        if (seen.add(m)) { fps(nf) = m; nf += 1 }
        j += 1
      }
    }
    var fpMin = Long.MaxValue
    var fpSum = 0L
    var x = 0
    while (x < nf) { val v = fps(x); if (v < fpMin) fpMin = v; fpSum += v; x += 1 }
    val row = new GenericInternalRow(5)
    row.update(0, nh.toLong)
    row.update(1, nf.toLong)
    row.update(2, if (nf == 0) null else java.lang.Long.valueOf(fpMin))
    row.update(3, fpSum)
    row.update(4, new GenericArrayData(
      if (nf == fps.length) fps else java.util.Arrays.copyOf(fps, nf)))
    row
  }
}
