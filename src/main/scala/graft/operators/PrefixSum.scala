package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed exclusive prefix sum (scan) over a global sort order —
  * the building block for sequence-packing layouts, byte-offset
  * assignment, and any "where does my row start" computation.
  *
  * `sum(...).over(Window.orderBy(...))` with no partition key (or a
  * low-cardinality one) funnels the whole input through one (or few)
  * partitions — the same scale-killer GlobalRank exists for. This
  * operator computes the identical exclusive running total
  * distributed, with the same one-RDD discipline (see GlobalRank's
  * scaladoc for why both jobs must share one RDD):
  *
  *   1. range-repartition on the sort key + sort within partitions —
  *      data stays spread across the cluster;
  *   2. one `runJob` sums `valueCol` per partition (a Long per
  *      partition reaches the driver, nothing else);
  *   3. `scanLeft` turns those into per-partition start offsets;
  *   4. a mapPartitions pass emits each row's running offset.
  *
  * Values must be Long (exact, associative); sort keys must include a
  * tie-break for a well-defined order.
  */
object PrefixSum {

  /** Adds `outCol` = sum of `valueCol` over all rows strictly before
    * this row in the global `sortCols` order. */
  def exclusive(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                outCol: String = "prefix_sum",
                numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    // loud driver-side validation: a non-Long value column would throw
    // an opaque ClassCastException inside a task otherwise
    require(df.schema(valueCol).dataType == org.apache.spark.sql.types.LongType,
      s"$valueCol must be LongType (exact, associative), got " +
      s"${df.schema(valueCol).dataType}")
    val n = numPartitions.getOrElse(
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val idx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd // ONE RDD: both jobs reuse its shuffle output
    val partSums = spark.sparkContext.runJob(rdd, (it: Iterator[Row]) => {
      var s = 0L
      while (it.hasNext) s += it.next().getLong(idx)
      s
    })
    val offsets = partSums.scanLeft(0L)(_ + _)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { row =>
        val r = Row.fromSeq(row.toSeq :+ acc)
        acc += row.getLong(idx)
        r
      }
    }
    spark.createDataFrame(out, sorted.schema.add(outCol, LongType, nullable = false))
  }

  /** Adds `outCol` = min of `valueCol` over all rows strictly before
    * this row in the global `sortCols` order (`Long.MaxValue` when no
    * row precedes). Same one-RDD, range-partitioned discipline as
    * [[exclusive]] — min is associative and commutative, so the
    * per-partition fold + scanLeft merge is exact. Building block for
    * dominance tests (Pareto frontier / skyline: a point is dominated
    * iff some point earlier in the (x, y) order has a smaller-or-equal
    * y), monotone envelope extraction, and record-so-far audits. */
  def exclusiveMin(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                   outCol: String = "prefix_min",
                   numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(valueCol).dataType == org.apache.spark.sql.types.LongType,
      s"$valueCol must be LongType, got ${df.schema(valueCol).dataType}")
    val n = numPartitions.getOrElse(
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val idx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd // ONE RDD: both jobs reuse its shuffle output
    val partMins = spark.sparkContext.runJob(rdd, (it: Iterator[Row]) => {
      var m = Long.MaxValue
      while (it.hasNext) m = math.min(m, it.next().getLong(idx))
      m
    })
    val offsets = partMins.scanLeft(Long.MaxValue)(math.min)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { row =>
        val r = Row.fromSeq(row.toSeq :+ acc)
        acc = math.min(acc, row.getLong(idx))
        r
      }
    }
    spark.createDataFrame(out, sorted.schema.add(outCol, LongType, nullable = false))
  }
}
