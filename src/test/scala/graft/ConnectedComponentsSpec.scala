package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("src", "dst")
    ConnectedComponents.minLabel(df, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chains, stars and singletons-in-pairs resolve to the component min") {
    // chain 1-2-3-4 (diameter 3), star 10-{11,12,13}, pair 20-21
    val labels = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
                        (10L, 12L), (13L, 10L), (21L, 20L)))
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("a NULL node id is a LOUD refusal, never a silent 0-decode (stated key contract)") {
    // r16 verdict task 3: graph keys (doc_id/vec_id) are never nulled
    // by the injection plans BECAUSE this contract throws — pin the
    // throw so the plans' key-exclusion stays justified by a test, not
    // by a scaladoc. (A silent getLong(0)-on-null would alias every
    // null endpoint to node 0 and quietly merge components.)
    import spark.implicits._
    val df = Seq((Some(1L), Some(2L)), (Some(3L), None))
      .toDF("src", "dst")
    val e = intercept[Exception](
      ConnectedComponents.minLabel(df, "src", "dst").collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("null node id"), msgs)
  }

  test("a long chain converges within the iteration cap") {
    // diameter 15: min-label needs ~15 rounds, below the default cap
    val labels = cc((0L until 15L).map(i => (i, i + 1)))
    assert(labels.values.toSet == Set(0L))
    assert(labels.size == 16)
  }

  test("a diameter-100 chain escalates to star contraction and still labels correctly") {
    // 20 plain propagation rounds cannot close a 100-hop chain; the
    // loop must fall through to large-star/small-star and converge
    val labels = cc((0L until 100L).map(i => (i, i + 1)))
    assert(labels.size == 101)
    assert(labels.values.toSet == Set(0L), s"chain not contracted: $labels")
  }

  test("star contraction converges in O(log n) rounds, same labels as propagation") {
    import spark.implicits._
    val part = new org.apache.spark.HashPartitioner(8)
    // canonical (bigger, smaller) edges of a 101-node chain + a star
    val edges = spark.sparkContext.parallelize(
      (0L until 100L).map(i => (i + 1, i)) ++ Seq((201L, 200L), (202L, 200L)))
    val (stars, rounds) = ConnectedComponents.starContract(edges, part)
    val got = stars.collect().toSet
    stars.unpersist(blocking = true)
    assert(rounds <= 15, s"expected O(log n) convergence, took $rounds rounds")
    assert(got == ((1L to 100L).map(i => (i, 0L)).toSet ++ Set((201L, 200L), (202L, 200L))),
      s"star set wrong: $got")
  }

  test("partitioner is sized from the measured edge count, not the shuffle conf") {
    // r14 ADVICE: attachOne's per-task ONE-side LongMap is bounded by
    // rows-per-partition, and deriving nPart from
    // spark.sql.shuffle.partitions (32) alone would make that bound a
    // tuning obligation at 100 TB. With rowsPerPartition forced tiny,
    // the 300-row symmetrized edge list must UPSIZE past the conf knob
    // — observable on the result's partition count — and still label
    // correctly through both the re-partition and the narrow rounds.
    import spark.implicits._
    val confPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pairs = (0L until 150L).map(i => (2 * i, 2 * i + 1)) // 150 pairs
    val df = pairs.toDF("src", "dst")
    // the action-free floor: conf knob ∨ the input's own partition
    // count (so a huge upstream never funnels through confPart tasks)
    val floor = math.max(confPart,
      df.select($"src", $"dst").rdd.getNumPartitions)
    // sym = 300 rows; a target WIDER than the edge list must keep the
    // floor (never downsize below the session's parallelism)
    val out = ConnectedComponents.minLabel(df, "src", "dst",
      rowsPerPartition = 1000L)
    assert(out.rdd.getNumPartitions == floor,
      "parallelism floor must hold when the derived count is smaller")
    val big = ConnectedComponents.minLabel(df, "src", "dst",
      rowsPerPartition = 4L) // ceil(300/4) = 75 > any test conf -> upsized
    assert(big.rdd.getNumPartitions == 75,
      s"expected the derived 75-partition layout, got ${big.rdd.getNumPartitions}")
    val labels = big.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == pairs.flatMap { case (a, b) => Seq(a -> a, b -> a) }.toMap)
  }

  test("dedup clusters: every doc maps to a canon_id <= doc_id within its pair set") {
    val out = graft.queries.Dedup.dedupClusters.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.nonEmpty)
    assert(out.forall { case (doc, canon) => canon <= doc })
    // canonical docs label themselves
    val byId = out.toMap
    val canons = out.map(_._2).toSet
    assert(canons.forall(c => byId(c) == c))
  }
}
