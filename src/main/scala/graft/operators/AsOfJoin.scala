package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * Backward: for each left row, the single right row with the same key
  * and the greatest right-time <= left-time. Forward: the smallest
  * right-time >= left-time. Both with optional strictness (exclude
  * equal times) and an optional tolerance bounding the match distance
  * (the pandas `merge_asof` surface).
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
      strict: Boolean = false,
      tolerance: Option[String] = None): DataFrame =
    asof(left, right, leftKey, leftTime, rightKey, rightTime, rightCols,
      joinType, strict, forwardDir = false, tolerance)

  /** Forward direction: smallest right-time >= left-time (strict: >).
    * `tolerance` (an SQL interval body, e.g. "90 days") drops matches
    * farther than left-time + tolerance — beyond-tolerance left rows
    * behave exactly like unmatched ones (dropped under "inner",
    * null-extended under "left"). */
  def forward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      rightCols: Seq[String],
      joinType: String = "inner",
      strict: Boolean = false,
      tolerance: Option[String] = None): DataFrame =
    asof(left, right, leftKey, leftTime, rightKey, rightTime, rightCols,
      joinType, strict, forwardDir = true, tolerance)

  private def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      rightCols: Seq[String],
      joinType: String,
      strict: Boolean,
      forwardDir: Boolean,
      tolerance: Option[String]): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"joinType=$joinType")
    val leftCols = left.columns.toSeq
    val lType = left.select(leftCols.map(col): _*).schema
    val rType = right.select(rightCols.map(col): _*).schema
    // ASOF semantics: a right row with a NULL key or NULL/unparseable
    // time matches nothing. Without this filter it would sort FIRST in
    // its window and its payload would be carried into every left row
    // of the partition — a spurious match no SQL ASOF join produces.
    // Left rows with NULL keys then simply find no right rows (inner
    // drops them; left emits them unmatched).
    val rightClean = right
      .filter(col(rightKey).isNotNull &&
              col(rightTime).cast("timestamp").isNotNull)
    // At equal time the lower side sorts first (secondary __side sort
    // holds for both directions). Non-strict: right rows first, so a
    // right row at exactly left-time is visible. Strict: left rows
    // first, so same-time right rows are excluded.
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
    // backward scans time ascending; forward scans descending so the
    // carried "last right row" is the SMALLEST right-time >= left-time.
    // Nulls first in both: a null-time left row must see no right rows
    // (desc defaults to nulls-last, which would hand it the global
    // minimum right row).
    val timeOrder: Column =
      if (forwardDir) col("__t").desc_nulls_first else col("__t").asc
    val w = Window.partitionBy(col("__k")).orderBy(timeOrder, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      // the matched row's own time, carried by the same window over
      // the same ordering — needed to apply the tolerance bound
      .withColumn("__mt",
        last(when(col("__side") === rSide, col("__t")), ignoreNulls = true).over(w))
      .filter(col("__side") === lSide)
    val bounded = tolerance.fold(matched) { tol =>
      val ok =
        if (forwardDir) col("__mt") <= col("__t") + expr(s"INTERVAL $tol")
        else col("__mt") >= col("__t") - expr(s"INTERVAL $tol")
      // a beyond-tolerance match is no match at all
      matched.withColumn("__match", when(ok, col("__match")))
    }
    val kept =
      if (joinType == "inner") bounded.filter(col("__match").isNotNull) else bounded
    kept.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
      rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
