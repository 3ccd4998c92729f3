package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection for the dup-graph edge union (`runMain
  * graft.EdgePlan [sfDir]`): the graph-family queries (clusters,
  * stats, pagerank, communities, apply, triangles, blast radius)
  * consume [[graft.queries.Dedup.dupGraphEdges]] through eager
  * localCheckpoints, so their own `Explain` output shows only the
  * post-checkpoint tail — the edge derivation (the part the r18
  * optimization round restructured) is invisible there. This prints
  * the edge frame's OWN formatted plan, which stays lazy up to the
  * union ∪ digest stars. */
object EdgePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Dedup.dupGraphEdges(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
