package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigating equi-join: salt the skewed (large) side, replicate
  * the small side across the salt domain, join on (key, salt).
  *
  * A hash-partitioned join sends every row of a hot key to one task;
  * at 100 TB one pathological key stalls the stage. Salting splits
  * each key's rows across `salts` tasks at the cost of replicating the
  * other side `salts`x — the classic trade when AQE's skew-join
  * splitting doesn't apply (e.g. the skewed side feeds an aggregation
  * keyed on the join key, or the engine's stats miss the skew).
  *
  * Results are identical to a plain inner equi-join (spec + DuckDB
  * oracle assert it); only the physical distribution changes. The salt
  * is derived from a hash of the full skewed-side row key-set, so it
  * is deterministic, not a rand() column (which would break retries /
  * speculative execution).
  *
  * Known limitation of the deterministic salt: rows of a hot key that
  * are IDENTICAL across all columns hash to the same salt, so a key
  * whose skew consists of exact duplicate rows still lands on one
  * task. Pre-aggregate such duplicates (they are combinable by
  * definition) or add a distinguishing column before salting; hashing
  * a rand()/monotonic id instead would spread them but silently break
  * retry determinism. Map-typed columns are not hashable — project
  * them away from the skewed side first.
  */
object SaltedJoin {

  /** @param skewed    large side with hot `key` values
    * @param replicated small side (gets duplicated `salts` times)
    * @param key       equi-join column present on both sides
    * @param salts     salt fan-out (tasks per hot key) */
  def inner(skewed: DataFrame, replicated: DataFrame, key: String,
            salts: Int = 8): DataFrame = {
    val saltedL = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.toIndexedSeq.map(col): _*), lit(salts)).cast("int"))
    val saltedR = replicated.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedL.join(saltedR, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
