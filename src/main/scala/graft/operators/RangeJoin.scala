package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-range (interval) join without a nested-loop plan.
  *
  * A pure range predicate (`r.ts BETWEEN l.ts - W AND l.ts`) has no
  * equi key, so Spark plans BroadcastNestedLoopJoin — the all-pairs
  * shape that works at test scale and dies at 100 TB. The classic fix
  * quantizes time into window-sized buckets: a right row at time s can
  * only match left rows in bucket(s) or bucket(s)+1 (for bucket width
  * = the window length), so the candidate space becomes a bucket
  * EQUI-join — shuffles partition evenly by time bucket, candidate
  * volume is |L| x (right rows per window), and the exact range
  * predicate filters the bucket collisions at full timestamp
  * precision. Same family as the banded dedup joins: coarse key to
  * make it an equi-join, exact predicate to keep the semantics.
  *
  * Skew note: a bucket is one shuffle key; if a single window holds a
  * hot spike, salt the bucket (SaltedJoin composes) or shrink the
  * bucket width to k buckets per window (explode k+1 on the right).
  */
object RangeJoin {

  /** Pairs where `rTs` falls in [lTs - windowSec, lTs) — "right events
    * in the preceding window of each left event". `lTs`/`rTs` must be
    * distinct column names; all columns of both inputs survive. */
  def preceding(left: DataFrame, right: DataFrame,
                lTs: String, rTs: String, windowSec: Long): DataFrame = {
    require(windowSec > 0, s"window must be positive, got $windowSec")
    val lb = left.withColumn("__lb",
      expr(s"unix_timestamp($lTs) div $windowSec"))
    val rbase: Column = expr(s"unix_timestamp($rTs) div $windowSec")
    val rb = right.withColumn("__rb", explode(array(rbase, rbase + 1)))
    lb.join(rb.hint("shuffle_hash"),
        col("__lb") === col("__rb") &&
        col(rTs) >= col(lTs) - expr(s"INTERVAL $windowSec SECONDS") &&
        col(rTs) < col(lTs))
      .drop("__lb", "__rb")
  }
}
