package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** tokens -> 60-bit hashes of the n-token shingles, in one compiled
  * pass — DISTINCT (sorted) by default; positional (index = window
  * start, duplicates kept) with `distinct = false` for span-level
  * consumers like exact-substring coverage.
  *
  * Replaces the interpreted HOF chain
  * `array_distinct(transform(sequence(...), i -> conv(substr(md5(
  * concat_ws(' ', slice(toks, i, n))), 1, 15), 16, 10)))` that
  * dominated every shingle-based dedup query: higher-order lambdas are
  * CodegenFallback and the md5 path allocates a hex string + base
  * conversion per shingle. Here the md5 is fed token bytes directly
  * (no shingle string is ever built) and the first 60 bits of the
  * digest are taken numerically.
  *
  * Value equivalence with the SQL formulation (and the DuckDB oracle
  * `CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT)`) is exact:
  * md5("t1 t2 t3") over UTF-8 bytes, first 15 hex chars = first 60
  * bits = (first-8-bytes-big-endian >>> 4). Covered by a spec
  * comparing against the HOF expression on real documents.
  */
case class ShingleHash(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(n > 0, s"shingle_hash: n=$n must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash"

  /** SQL-registered (GraftFunctions), so a mistyped argument must fail
    * at ANALYSIS, not as garbage hashes or an out-of-bounds crash
    * mid-job: getUTF8String over an int array misreads the 8-byte
    * slots as (offset, length) string pointers (r14 review). */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash requires array<string> tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHash.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHash.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

object ShingleHash {

  private val SPACE = Array[Byte](' ')
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Called from generated code — must stay public + static-friendly. */
  def compute(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val total = tokens.numElements()
    val m = total - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val md = md5Local.get()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      // concat_ws semantics EXACTLY, nulls included: concat_ws skips a
      // null token AND its separator, so the kernel must too — the
      // empty-string substitution it replaced kept both separators and
      // hashed a different shingle for any null-bearing array,
      // breaking the documented HOF/oracle equivalence (r14 review;
      // split()-produced fixtures are null-free, so hashes there are
      // unchanged)
      var j = 0
      var emitted = false
      while (j < n) {
        val tok = tokens.getUTF8String(i + j)
        if (tok != null) {
          if (emitted) md.update(SPACE)
          md.update(tok.getBytes)
          emitted = true
        }
        j += 1
      }
      val d = md.digest()
      // first 15 hex chars == top 60 bits == big-endian first 8 bytes >>> 4
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      out(i) = h >>> 4
      i += 1
    }
    if (!distinct) return new GenericArrayData(out)
    // distinct AND sorted ascending — the sortedness is CONTRACT, not
    // incidental: Dedup.prefixFilter's sorted_intersect_count verify
    // kernel two-pointer-merges these arrays without re-sorting
    // (ShingleHashSpec pins it)
    java.util.Arrays.sort(out)
    var w = 1
    var r = 1
    while (r < m) {
      if (out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Column helper: distinct n-token shingle hashes of a token array. */
  def shingleHashes(tokens: Column, n: Int = 3): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(tokens), n))

  /** Column helper: ALL n-token window hashes in positional order
    * (array index = window start) — the exact-substring span input. */
  def windowHashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(tokens), n, distinct = false))
}
