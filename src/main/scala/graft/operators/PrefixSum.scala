package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.LongType

/** Distributed exclusive prefix sum (scan) over a global sort order —
  * the building block for sequence-packing layouts, byte-offset
  * assignment, and any "where does my row start" computation.
  *
  * `sum(...).over(Window.orderBy(...))` with no partition key (or a
  * low-cardinality one) funnels the whole input through one (or few)
  * partitions — the same scale-killer GlobalRank exists for. This
  * operator computes the identical exclusive running total
  * distributed via the shared [[ScannedFold]] scaffold (range-
  * repartition + sort, ONE runJob folding a Long per partition,
  * scanLeft offsets, a stamping pass over the same RDD — see its
  * scaladoc for why both jobs must share one RDD).
  *
  * Values must be Long (exact, associative); sort keys must include a
  * tie-break for a well-defined order.
  */
object PrefixSum {

  private def requireLong(df: DataFrame, valueCol: String): Int = {
    // loud driver-side validation: a non-Long value column would throw
    // an opaque ClassCastException inside a task otherwise
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be LongType (exact, associative), got " +
        s"${df.schema(valueCol).dataType}")
    df.schema.fieldIndex(valueCol)
  }

  /** Adds `outCol` = sum of `valueCol` over all rows strictly before
    * this row in the global `sortCols` order. */
  def exclusive(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                outCol: String = "prefix_sum",
                numPartitions: Option[Int] = None): DataFrame = {
    val idx = requireLong(df, valueCol)
    ScannedFold(df, sortCols, numPartitions,
      zero = 0L, combine = _ + _,
      contribution = _.getLong(idx), emitBeforeCombine = true, outCol)._1
  }

  /** Adds `outCol` = min of `valueCol` over all rows strictly before
    * this row in the global `sortCols` order (`Long.MaxValue` when no
    * row precedes). Min is associative and commutative with identity
    * MaxValue, so the per-partition fold + scanLeft merge is exact.
    * Building block for dominance tests (Pareto frontier / skyline: a
    * point is dominated iff some point earlier in the (x, y) order has
    * a smaller-or-equal y), monotone envelope extraction, and
    * record-so-far audits. */
  def exclusiveMin(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                   outCol: String = "prefix_min",
                   numPartitions: Option[Int] = None): DataFrame = {
    val idx = requireLong(df, valueCol)
    ScannedFold(df, sortCols, numPartitions,
      zero = Long.MaxValue, combine = math.min,
      contribution = _.getLong(idx), emitBeforeCombine = true, outCol)._1
  }
}
