package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.7): a custom `Aggregator`
  * registered through `functions.udaf`, the idiomatic replacement for
  * the legacy UserDefinedAggregateFunction.
  *
  * Semantics are chosen oracle-safe: the per-row discounted price is
  * rounded to DECIMAL(.,4) exactly like Spark's
  * `CAST(price * (1.0 - discount) AS DECIMAL(18,4))` (BigDecimal
  * valueOf + HALF_UP matches Cast's Decimal(double).toPrecision), and
  * the buffer sums exactly, so merge order cannot change the result —
  * the property any distributed Aggregator must hold: `merge` runs in
  * partition-completion order, which is nondeterministic.
  */
object Aggregators {

  case class RevBuf(sum: JBigDecimal, n: Long)
  case class RevOut(revenue: JBigDecimal, n_items: Long)

  /** (extendedprice, discount) -> exact discounted revenue + count. */
  object DiscountedRevenue extends Aggregator[(Double, Double), RevBuf, RevOut] {
    private def rowValue(price: Double, discount: Double): JBigDecimal =
      JBigDecimal.valueOf(price * (1.0 - discount)).setScale(4, RoundingMode.HALF_UP)

    override def zero: RevBuf = RevBuf(JBigDecimal.ZERO, 0L)
    override def reduce(b: RevBuf, in: (Double, Double)): RevBuf =
      RevBuf(b.sum.add(rowValue(in._1, in._2)), b.n + 1)
    override def merge(a: RevBuf, b: RevBuf): RevBuf =
      RevBuf(a.sum.add(b.sum), a.n + b.n)
    override def finish(b: RevBuf): RevOut = RevOut(b.sum, b.n)
    override def bufferEncoder: Encoder[RevBuf] = Encoders.product[RevBuf]
    override def outputEncoder: Encoder[RevOut] = Encoders.product[RevOut]
  }
}
