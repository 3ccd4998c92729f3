package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * For each left row, attach the single right row with the same key
  * and the greatest right-time <= left-time (backward direction).
  *
  * Implementation is the scale-first union+window pattern, NOT a range
  * join: tag both sides, union, ONE shuffle on the key, sort each key
  * partition by (time, side) and carry the last non-null right payload
  * forward. Cost is O((|L|+|R|) log p) with no candidate-pair
  * explosion, versus the naive `l.t >= r.t` theta-join which Spark
  * plans as a broadcast-nested-loop. Right rows must be unique per
  * (key, time) for deterministic output — pre-dedupe the right side.
  *
  * At cluster scale the shuffle partitions by key hash; a hot key
  * serializes within its partition only (same behavior as any keyed
  * window — salt upstream if one key dominates).
  */
object AsOfJoin {

  /** @param rightCols right columns to attach (must not collide with
    *                  left column names)
    * @param joinType  "inner" (drop unmatched left rows) or "left"
    * @param strict    false: greatest right-time <= left-time (ASOF >=);
    *                  true: greatest right-time < left-time (ASOF >) */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      rightCols: Seq[String],
      joinType: String = "inner",
      strict: Boolean = false): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"joinType=$joinType")
    val leftCols = left.columns.toSeq
    val lType = left.select(leftCols.map(col): _*).schema
    val rType = right.select(rightCols.map(col): _*).schema
    // ASOF semantics: a right row with a NULL key or NULL/unparseable
    // time matches nothing. Without this filter it would sort FIRST in
    // its window (ASC = NULLS FIRST) and its payload would be carried
    // into every left row of the partition — a spurious match no SQL
    // ASOF join produces. Left rows with NULL keys then simply find no
    // right rows (inner drops them; left emits them unmatched).
    val rightClean = right
      .filter(col(rightKey).isNotNull &&
              col(rightTime).cast("timestamp").isNotNull)
    // At equal time the lower side sorts first. Non-strict: right rows
    // first, so a right row at exactly left-time is visible (<=).
    // Strict: left rows first, so same-time right rows are excluded (<).
    val (lSide, rSide) = if (strict) (0, 1) else (1, 0)
    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).cast("timestamp").as("__t"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"),
      lit(lSide).as("__side"))
    val r = rightClean.select(
      col(rightKey).as("__k"), col(rightTime).cast("timestamp").as("__t"),
      lit(null).cast(lType).as("__l"),
      struct(rightCols.map(col): _*).as("__r"),
      lit(rSide).as("__side"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === lSide)
    val kept = if (joinType == "inner") joined.filter(col("__match").isNotNull) else joined
    kept.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
      rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
