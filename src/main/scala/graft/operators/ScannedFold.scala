package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** The one-RDD distributed-scan scaffold shared by [[PrefixSum]]
  * (exclusive sum / min) and [[GlobalRank]] (global rank): range-
  * repartition + sort-within-partitions, ONE `runJob` folding each
  * partition (a Long per partition to the driver, nothing else),
  * `scanLeft` into per-partition start offsets, and a second pass over
  * the SAME RDD stamping each row's running value. Extracted (r14
  * review) because the discipline lived in three near-identical
  * copies — the invariant that both jobs share one RDD (so the second
  * reuses the first's shuffle files and the partition layout cannot be
  * re-planned between actions; see GlobalRank's scaladoc) now has one
  * spelling.
  *
  * `combine` must be associative with identity `zero` (sum/0, min/MAX,
  * count via contribution 1); `emitBeforeCombine` selects exclusive
  * (emit the offset BEFORE folding the row in — prefix sums) vs
  * inclusive (fold first — ranks); `validate` rides the fold job for
  * free (GlobalRank's keyCols null contract). Returns the stamped
  * frame plus the scanLeft offsets array (its last element is the
  * whole-input fold — GlobalRank's total). */
private[operators] object ScannedFold {

  def apply(df: DataFrame, sortCols: Seq[Column], numPartitions: Option[Int],
            zero: Long, combine: (Long, Long) => Long,
            contribution: Row => Long, emitBeforeCombine: Boolean,
            outCol: String,
            validate: Row => Unit = _ => ()): (DataFrame, Array[Long]) = {
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = sorted.rdd // ONE RDD: both jobs below reuse its shuffle
    val partAggs = spark.sparkContext.runJob(rdd, (it: Iterator[Row]) => {
      var s = zero
      while (it.hasNext) {
        val row = it.next()
        validate(row)
        s = combine(s, contribution(row))
      }
      s
    })
    val offsets = partAggs.scanLeft(zero)(combine)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { row =>
        if (emitBeforeCombine) {
          val r = Row.fromSeq(row.toSeq :+ acc)
          acc = combine(acc, contribution(row))
          r
        } else {
          acc = combine(acc, contribution(row))
          Row.fromSeq(row.toSeq :+ acc)
        }
      }
    }
    (spark.createDataFrame(out,
      sorted.schema.add(outCol, LongType, nullable = false)), offsets)
  }
}
