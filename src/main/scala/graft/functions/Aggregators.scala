package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.7): a custom `Aggregator`
  * registered through `functions.udaf`, the idiomatic replacement for
  * the legacy UserDefinedAggregateFunction.
  *
  * Semantics are chosen oracle-safe: the per-row discounted price is
  * converted to integer 1e-4 units exactly like
  * [[graft.model.Money.cents]] (`floor(price * (1-discount) * 10000 +
  * 0.5)` — pure IEEE-754 double ops, bit-identical in any engine), and
  * the buffer sums exact BIGINTs, so merge order cannot change the
  * result — the property any distributed Aggregator must hold: `merge`
  * runs in partition-completion order, which is nondeterministic.
  */
object Aggregators {

  case class RevBuf(sum: Long, n: Long)
  case class RevOut(revenue: Long, n_items: Long)

  /** (extendedprice, discount) -> exact discounted revenue in 1e-4
    * units + count of CONTRIBUTING rows.
    *
    * Inputs are Option[Double], not Double (r16, found by the
    * null-injected parity corpus): a primitive-typed Aggregator input
    * decodes a NULL column as 0.0 SILENTLY — a null discount billed as
    * full price, inflating revenue with no error anywhere. The SQL
    * aggregate convention applies instead: a row where either operand
    * is NULL contributes to neither the sum nor the count (exactly
    * `sum(expr)` / `count(expr)` semantics — the oracle counts
    * count(expr), not count(*)). */
  object DiscountedRevenue
      extends Aggregator[(Option[Double], Option[Double]), RevBuf, RevOut] {
    private def rowUnits(price: Double, discount: Double): Long =
      math.floor(price * (1.0 - discount) * 10000.0 + 0.5).toLong

    override def zero: RevBuf = RevBuf(0L, 0L)
    override def reduce(b: RevBuf, in: (Option[Double], Option[Double])): RevBuf =
      in match {
        case (Some(p), Some(d)) => RevBuf(b.sum + rowUnits(p, d), b.n + 1)
        case _                  => b
      }
    override def merge(a: RevBuf, b: RevBuf): RevBuf =
      RevBuf(a.sum + b.sum, a.n + b.n)
    override def finish(b: RevBuf): RevOut = RevOut(b.sum, b.n)
    override def bufferEncoder: Encoder[RevBuf] = Encoders.product[RevBuf]
    override def outputEncoder: Encoder[RevOut] = Encoders.product[RevOut]
  }

  case class TopKBuf(items: Seq[(Long, Long)])
  case class TopKOut(items: Seq[(Long, Long)])

  /** Bounded top-k per group as a mergeable aggregate — the scale
    * alternative to `row_number().over(partitionBy(...)) <= k`: the
    * window form sorts EVERY group member inside the exchange, while
    * this buffer never holds more than k (value, tiebreak) pairs and
    * aggregates partially map-side, so the shuffle carries at most
    * k rows per group per partition instead of the whole group.
    * Ordering is (value DESC, tiebreak ASC) — a total order, so
    * `merge` is associative/commutative regardless of the
    * nondeterministic partition-completion order.
    *
    * The VALUE input is Option[Long] so a NULL column is skipped
    * structurally — the SQL aggregate convention, same shape as
    * [[DiscountedRevenue]] (r16 review: the first fix was a scaladoc
    * warning plus one call-site filter, which left the silent
    * NULL-decodes-as-0 rank live for every future caller; there are
    * ten call sites today). The skip fixes the SCALA side for every
    * caller; each caller's ORACLE must still mirror it — rank only
    * non-null values (q_topk_agg r16, q_source_cap r17: a bare
    * `ORDER BY v DESC NULLS LAST` still hands rn <= k to null rows in
    * groups smaller than k). Callers whose value is DERIVED non-null
    * (the similarity sims/ADC scores) mirror vacuously.
    * The TIEBREAK stays a primitive Long: every
    * caller passes a non-null id/key column, and a null tiebreak would
    * merely decode to 0 — it cannot change WHICH values rank, only how
    * exact ties order, and exact ties on a key column don't occur. */
  class TopK(k: Int) extends Aggregator[(Option[Long], Long), TopKBuf, TopKOut] {
    require(k > 0, s"TopK requires k > 0, got $k")
    // no negation trick: -Long.MinValue overflows and would rank the
    // minimum value first
    private val ord: Ordering[(Long, Long)] =
      Ordering.by[(Long, Long), Long](_._1).reverse.orElseBy(_._2)
    override def zero: TopKBuf = TopKBuf(Vector.empty)
    override def reduce(b: TopKBuf, in0: (Option[Long], Long)): TopKBuf = in0 match {
      case (None, _) => b // a NULL value has no rank (sum/count(expr) convention)
      case (Some(v), tb) =>
        val in = (v, tb)
        // fast path first: the overwhelming majority of rows lose to the
        // k-th element — one comparison, no allocation, no sort
        if (b.items.size >= k && ord.lteq(b.items.last, in)) b
        else TopKBuf((b.items :+ in).sorted(ord).take(k))
    }
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf((a.items ++ b.items).sorted(ord).take(k))
    override def finish(b: TopKBuf): TopKOut = TopKOut(b.items)
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKOut] = Encoders.product[TopKOut]
  }
}
