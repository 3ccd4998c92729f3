package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by iterative min-label
  * propagation — the step that turns a near-duplicate PAIR list into
  * duplicate CLUSTERS (and thus a canonical-document assignment), the
  * standard tail of a dedup pipeline: pairs only say "a~b"; keeping
  * one representative per transitive group needs the component.
  *
  * Algorithm: every node starts labeled with its own id; each round a
  * node takes the min of its label and its neighbors' labels; at
  * fixpoint the label is the component's min id (the canonical doc).
  *
  * Implementation is deliberately RDD-based — the documented exception
  * to DataFrame-first for iterative graph algorithms (the same choice
  * GraphX makes): a DataFrame loop grows its Catalyst plan
  * exponentially (each round references the previous twice — union +
  * join; observed as a driver OOM just rendering the explain string at
  * diameter 15), and `localCheckpoint` truncation leaves blocks that
  * `Dataset.unpersist` cannot free (they live below the CacheManager).
  * With raw RDDs each round is persist/unpersist of exactly one label
  * RDD, lineage is linear and truncated at persisted parents, and the
  * edge and label RDDs share one HashPartitioner so the per-round join
  * shuffles ONLY the propagated labels.
  *
  * Scale design (the 100 TB lens):
  *  - each round is one join (edges co-partitioned, labels shuffled) +
  *    `reduceByKey(min)` with map-side combine — no all-pairs anything;
  *  - rounds = graph diameter. Near-dup graphs are overwhelmingly tiny
  *    star/chain clusters (diameter 2-4); for adversarial long chains
  *    the classic large-star/small-star (pointer-doubling) variant
  *    drops rounds to O(log n) — the documented escalation path;
  *  - memory holds at most two label RDDs plus the edge RDD, all
  *    MEMORY_AND_DISK (spill, not OOM);
  *  - convergence is a count action per round (one Long to the
  *    driver); exhausting `maxIters` without converging THROWS — a
  *    silently partial labeling would assign wrong canonical docs.
  */
object ConnectedComponents {

  /** Labels every node of the undirected edge list with its component's
    * min node id. Node id columns must be long-typed. Output columns:
    * (id, lbl). */
  def minLabel(edges: DataFrame, src: String, dst: String,
               maxIters: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val part = new HashPartitioner(nPart)

    val sym: RDD[(Long, Long)] = edges
      .select(col(src).cast("long"), col(dst).cast("long")).rdd
      .flatMap { r =>
        val a = r.getLong(0); val b = r.getLong(1)
        Seq((a, b), (b, a))
      }
      .partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels: RDD[(Long, Long)] = sym.keys.distinct(nPart)
      .map(id => (id, id))
      .partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count() // materialize so the first round starts from blocks

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      // neighbor labels: sym and labels share `part`, so the join is
      // shuffle-free; only the propagated (neighbor, label) pairs and
      // the min-combine move
      val prop = sym.join(labels).map { case (_, (b, lbl)) => (b, lbl) }
      val next = labels.union(prop)
        .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.join(labels)
        .filter { case (_, (n, o)) => n < o }.count() // materializes next
      labels.unpersist(blocking = true)
      labels = next
      iter += 1
    }
    sym.unpersist(blocking = true)
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds " +
        "(graph diameter exceeds the cap); raise maxIters or switch to " +
        "the large-star/small-star pointer-doubling variant")

    val out = labels.map { case (id, lbl) => Row(id, lbl) }
    spark.createDataFrame(out, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("lbl", LongType, nullable = false))))
  }
}
