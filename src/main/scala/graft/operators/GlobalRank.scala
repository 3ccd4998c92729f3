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
  *   2. a hand-rolled zipWithIndex: one `runJob` counts each sorted
  *      partition (and piggybacks the keyCols null check), `scanLeft`
  *      turns the counts into per-partition offsets, and a
  *      `mapPartitionsWithIndex` stamps offset + local index. (It WAS
  *      `RDD.zipWithIndex` until the null check needed a ride on the
  *      count pass — same two-job shape, now spelled out.)
  *
  * The two-jobs-over-ONE-RDD shape is deliberate, not a DataFrame-side
  * count-then-offset: the second job reuses the first's shuffle files,
  * so the partition layout is consistent by construction. Two separate
  * DataFrame actions do NOT guarantee that (AQE / sampling can re-plan
  * the exchange between actions — observed as misaligned offsets at
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
    * the ranking's count job — callers needing N avoid a re-scan).
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
    * job the ranking already runs, so a violation fails the job
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
    val nKeys = nNullCheckedKeys // avoid closing over `this`
    // rank = inclusive count scan over the shared one-RDD scaffold;
    // the keyCols null contract piggybacks on the fold pass — zero
    // extra jobs, and the failure names the row
    val (out, offsets) = ScannedFold(df, sortCols, numPartitions,
      zero = 0L, combine = _ + _, contribution = _ => 1L,
      emitBeforeCombine = false, outCol = rankCol,
      validate = { row =>
        var k = 0
        while (k < nKeys) {
          if (row.isNullAt(k)) throw new IllegalArgumentException(
            s"GlobalRank keyCols contract violated: NULL key (field $k) in row $row — " +
              "an inner join-back would silently drop this row; rank on non-null keys")
          k += 1
        }
      })
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
