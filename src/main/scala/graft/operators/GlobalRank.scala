package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact global ranking without a single-partition sort.
  *
  * `Window.orderBy(...)` with no partition key moves the whole input
  * to ONE partition (Spark even warns) — the classic plan that works
  * at test scale and dies at cluster scale. This operator computes the
  * identical ranks distributed:
  *
  *   1. range-repartition on the sort key + sort within partitions
  *      (the same machinery as a global ORDER BY — data stays spread);
  *   2. `RDD.zipWithIndex`: a count job over the sorted partitions,
  *      then per-partition index + cumulative offset.
  *
  * zipWithIndex is used deliberately instead of a DataFrame-side
  * count-then-offset: its two internal jobs run over the SAME RDD, so
  * the second job reuses the first's shuffle files and the partition
  * layout is consistent by construction. Two separate DataFrame
  * actions do NOT guarantee that (AQE / sampling can re-plan the
  * exchange between actions — observed as misaligned offsets at
  * sf0.01). The row-level hop costs codegen for this one operator but
  * buys determinism; everything downstream is DataFrame again.
  *
  * Sort keys must include a unique tie-break column for well-defined
  * ranks.
  */
object GlobalRank {

  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
                     rankCol: String = "global_rank",
                     numPartitions: Option[Int] = None,
                     keyCols: Seq[String] = Nil): DataFrame =
    rankedWithTotal(df, sortCols, rankCol, numPartitions, keyCols)._1

  /** Same, also returning the total row count (already computed by
    * zipWithIndex's count job — callers needing N avoid a re-scan).
    *
    * `keyCols` (a unique key, usually the tie-break column) opts into
    * the NARROW path: only a `(keyCols, sortCols)` projection takes
    * the range-shuffle + row-level index hop, and the rank joins back
    * onto the full rows by key. For wide rows (a documents table with
    * the text column) this is the difference between serializing the
    * corpus twice through non-Tungsten Rows and shuffling it once
    * through a codegen'd hash join — without `keyCols` the full row
    * rides the RDD hop (fine for already-narrow inputs).
    *
    * CONTRACT on `keyCols`: values must be NON-NULL (an inner
    * equi-join would silently drop NULL-key rows — enforced, see
    * below) and UNIQUE (a duplicated key would join one rank onto
    * several rows, silently inflating the output — callers needing a
    * guaranteed-unique key use the row's primary key or include one
    * in the projection). Nulls are detected for free inside the count
    * job that zipWithIndex already runs, so a violation fails the job
    * loudly instead of corrupting ranks. */
  def rankedWithTotal(df: DataFrame, sortCols: Seq[Column],
                      rankCol: String = "global_rank",
                      numPartitions: Option[Int] = None,
                      keyCols: Seq[String] = Nil): (DataFrame, Long) = {
    if (keyCols.nonEmpty) {
      // alias each sort expression so the narrow projection is
      // well-defined even for computed sort keys; order is preserved
      val aliased = sortCols.zipWithIndex.map { case (c, i) => c.as(s"__sort$i") }
      val narrow = df.select(keyCols.map(col) ++ aliased: _*)
      val (ranked, total) = rankedNarrow(
        narrow, sortCols.indices.map(i => col(s"__sort$i")), rankCol, numPartitions,
        nNullCheckedKeys = keyCols.length)
      val ranks = ranked.select(keyCols.map(col) :+ col(rankCol): _*)
      return (df.join(ranks, keyCols), total)
    }
    rankedNarrow(df, sortCols, rankCol, numPartitions)
  }

  private def rankedNarrow(df: DataFrame, sortCols: Seq[Column],
                           rankCol: String,
                           numPartitions: Option[Int],
                           nNullCheckedKeys: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val sortedRdd = sorted.rdd // ONE RDD: both jobs below reuse its shuffle
    val nKeys = nNullCheckedKeys // avoid closing over `this`
    val counts = spark.sparkContext.runJob(sortedRdd,
      (it: Iterator[Row]) => {
        var c = 0L
        while (it.hasNext) {
          val row = it.next()
          // piggyback the keyCols null contract on the count pass —
          // zero extra jobs, and the failure names the row
          var k = 0
          while (k < nKeys) {
            if (row.isNullAt(k)) throw new IllegalArgumentException(
              s"GlobalRank keyCols contract violated: NULL key (field $k) in row $row — " +
                "an inner join-back would silently drop this row; rank on non-null keys")
            k += 1
          }
          c += 1
        }
        c
      })
    val offsets = counts.scanLeft(0L)(_ + _)
    val ranked = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var i = offsets(pid)
      it.map { row => i += 1; Row.fromSeq(row.toSeq :+ i) }
    }
    val out = spark.createDataFrame(
      ranked, sorted.schema.add(rankCol, LongType, nullable = false))
    (out, offsets.last)
  }

  /** Exact `ntile(tiles)` over a global order, derived from the global
    * rank (same tile-size rule as SQL ntile: the first `N mod tiles`
    * tiles get one extra row). */
  def ntileExact(df: DataFrame, tiles: Int, sortCols: Seq[Column],
                 tileCol: String = "tile", keyCols: Seq[String] = Nil): DataFrame = {
    require(tiles > 0, s"ntile requires a positive tile count, got $tiles")
    val (ranked, total) = rankedWithTotal(df, sortCols, "__grank", None, keyCols)
    val base = total / tiles
    val rem = total % tiles
    val r = col("__grank")
    val tileExpr =
      if (base == 0) r // fewer rows than tiles: tile i = row i
      else when(r <= rem * (base + 1),
             ((r - 1) / (base + 1) + 1))
           .otherwise(lit(rem) + ((r - 1 - rem * (base + 1)) / base + 1))
    // long, not int: SQL ntile is BIGINT in DuckDB/ANSI, and the
    // driver's oracle compare is type-strict
    ranked.withColumn(tileCol, tileExpr.cast("long")).drop("__grank")
  }
}
