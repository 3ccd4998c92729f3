package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd parser for the ProductView wire timestamp
  * `yyyy-MM-dd HH:mm:ss[.SSS][±HHMM|Z]` (UTC session semantics).
  *
  * `to_timestamp(c, "yyyy-MM-dd HH:mm:ss[.SSS][XX]")` builds a
  * DateTimeFormatter with optional sections and try-parses per row —
  * the dominant cost of the flagship parse path. This expression is a
  * fixed-position digit scan over the UTF8 bytes: no formatter, no
  * exceptions, null on malformed input (try_to_timestamp semantics,
  * which is also what from_json's permissive mode gives malformed
  * records upstream).
  *
  * Equivalence with the pattern (same accepted grammar, same UTC
  * interpretation, same micros) is asserted by WireTimestampSpec over
  * all four wire variants and malformed inputs.
  */
case class WireTimestamp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "wire_timestamp"

  /** SQL-registered (GraftFunctions): a non-string argument must fail
    * at ANALYSIS — without this check `wire_timestamp(123)` failed
    * Janino compilation (no parseMicros(int) overload), silently fell
    * back to interpreted mode, then threw ClassCastException per row
    * (r14 review). */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wire_timestamp requires a string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = WireTimestamp.parseMicros(input.asInstanceOf[UTF8String])
    if (v == WireTimestamp.INVALID) null else java.lang.Long.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("wireTs")
      s"""
         |long $v = graft.functions.WireTimestamp.parseMicros($c);
         |if ($v == graft.functions.WireTimestamp.INVALID()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $v;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WireTimestamp =
    copy(child = newChild)
}

object WireTimestamp {

  val INVALID: Long = Long.MinValue

  /** Days from 1970-01-01 for a civil date (Hinnant's algorithm). */
  private def daysFromCivil(yIn: Int, m: Int, d: Int): Long = {
    val y = if (m <= 2) yIn - 1 else yIn
    val era = Math.floorDiv(y, 400)
    val yoe = y - era * 400
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    era * 146097L + doe - 719468L
  }

  /** Micros since epoch, or INVALID. Called from generated code. */
  def parseMicros(s: UTF8String): Long = {
    val b = s.getBytes
    val n = b.length
    if (n < 19) return INVALID
    @inline def dig(i: Int): Int = {
      val c = b(i) - '0'
      if (c < 0 || c > 9) -1 else c
    }
    @inline def two(i: Int): Int = {
      val a = dig(i); val c = dig(i + 1)
      if (a < 0 || c < 0) -1 else a * 10 + c
    }
    if (b(4) != '-' || b(7) != '-' || b(10) != ' ' || b(13) != ':' || b(16) != ':')
      return INVALID
    val y4 = { val a = two(0); val c = two(2); if (a < 0 || c < 0) return INVALID; a * 100 + c }
    val mo = two(5); val dd = two(8)
    val hh = two(11); val mi = two(14); val ss = two(17)
    if (mo < 1 || mo > 12 || dd < 1 ||
        hh > 23 || hh < 0 || mi > 59 || mi < 0 || ss > 59 || ss < 0) return INVALID
    // strict civil-date check (the formatter rejects Feb 30 etc.)
    val leap = (y4 % 4 == 0 && y4 % 100 != 0) || y4 % 400 == 0
    val dim = mo match {
      case 2 => if (leap) 29 else 28
      case 4 | 6 | 9 | 11 => 30
      case _ => 31
    }
    if (dd > dim) return INVALID
    var micros =
      daysFromCivil(y4, mo, dd) * 86400000000L +
      (hh * 3600L + mi * 60L + ss) * 1000000L
    var p = 19
    if (p < n && b(p) == '.') {
      // the [.SSS] formatter section accepts ONE to THREE fraction
      // digits (".4" = 400 ms, ".45" = 450 ms), rejects a bare dot and
      // a 4th digit — probed against try_to_timestamp on Spark 4.1
      p += 1
      var k = 0
      var frac = 0
      while (k < 3 && p < n && dig(p) >= 0) { frac = frac * 10 + dig(p); k += 1; p += 1 }
      if (k == 0) return INVALID
      if (p < n && dig(p) >= 0) return INVALID
      while (k < 3) { frac *= 10; k += 1 } // scale to millis
      micros += frac * 1000L
    }
    if (p < n) {
      val sign = b(p)
      if (sign == 'Z' && p + 1 == n) return micros
      if ((sign != '+' && sign != '-') || p + 5 != n) return INVALID
      val oh = two(p + 1); val om = two(p + 3)
      // ZoneOffset's valid range is exactly +/-18:00 — +18:30 must be
      // INVALID like the java.time formatter this parser mirrors
      if (oh < 0 || oh > 18 || om < 0 || om > 59 || (oh == 18 && om > 0))
        return INVALID
      val off = (oh * 3600L + om * 60L) * 1000000L
      micros = if (sign == '+') micros - off else micros + off
    }
    micros
  }

  /** Column helper. */
  def wireTimestamp(c: Column): Column =
    ColumnBridge.column(WireTimestamp(ColumnBridge.expression(c)))
}
