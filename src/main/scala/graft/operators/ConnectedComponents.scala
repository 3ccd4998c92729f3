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
  * edge, label and neighbor-min RDDs all share one HashPartitioner so
  * the propagation join and the merge join are shuffle-free — the only
  * data that shuffles per round is the propagated (neighbor, label)
  * pair stream into its min-combine.
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
    * min node id. Node id columns must be integral (int/long) and
    * non-null — validated loudly, because a silent cast would turn a
    * bad id into an opaque executor NPE. Output columns: (id, lbl).
    *
    * The final label table is returned as a DataFrame over the last
    * round's persisted RDD; its blocks are reclaimed by the
    * ContextCleaner once the result is unreferenced (Bench's
    * between-query `System.gc()` forces exactly that), and every
    * intermediate round is unpersisted eagerly inside the loop. */
  def minLabel(edges: DataFrame, src: String, dst: String,
               maxIters: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val idTypes = Seq(src, dst).map(c => edges.schema(c).dataType)
    require(idTypes.forall(t => t == LongType || t == org.apache.spark.sql.types.IntegerType),
      s"node id columns ($src, $dst) must be integral, got $idTypes")
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val part = new HashPartitioner(nPart)

    val sym: RDD[(Long, Long)] = edges
      .select(col(src).cast("long"), col(dst).cast("long")).rdd
      .flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1))
          throw new IllegalArgumentException(
            s"null node id in edge list (columns $src, $dst)")
        val a = r.getLong(0); val b = r.getLong(1)
        Seq((a, b), (b, a))
      }
      .partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // init labels(id) = id with ZERO extra shuffles: sym already has
    // `part`, so the dedup reduceByKey is partition-local, and the
    // identity relabel preserves the partitioner
    var labels: RDD[(Long, Long)] = sym
      .mapValues(_ => 0L)
      .reduceByKey(part, (a: Long, _: Long) => a)
      .mapPartitions(_.map { case (id, _) => (id, id) },
        preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count() // materialize so the first round starts from blocks
    var labelsStore: RDD[_] = labels // the persisted RDD to release

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      // sym and labels share `part`: the propagation join is
      // shuffle-free; ONLY the propagated (neighbor, label) pairs
      // shuffle, in the reduceByKey's min-combine
      val prop = sym.join(labels).map { case (_, (b, lbl)) => (b, lbl) }
      val nbrMin = prop.reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
      // co-partitioned (part, part) outer join: no shuffle; keep (old,
      // new) per node so the convergence count reads the same blocks
      val merged = labels.leftOuterJoin(nbrMin)
        .mapValues { case (own, nbr) => (own, math.min(own, nbr.getOrElse(own))) }
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = merged.values.filter { case (o, n) => n < o }.count()
      labelsStore.unpersist(blocking = true)
      labels = merged.mapValues(_._2) // partitioner-preserving view
      labelsStore = merged
      iter += 1
    }
    sym.unpersist(blocking = true)
    if (changed > 0) {
      labelsStore.unpersist(blocking = true)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds " +
        "(graph diameter exceeds the cap); raise maxIters or switch to " +
        "the large-star/small-star pointer-doubling variant")
    }

    val out = labels.map { case (id, lbl) => Row(id, lbl) }
    spark.createDataFrame(out, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("lbl", LongType, nullable = false))))
  }
}
