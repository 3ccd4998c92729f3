package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Post-execution plan inspection: `runMain graft.ExplainFinal <query>
  * [sfDir]` EXECUTES a registered query through the noop sink (the
  * bench's own timed action) and prints the FINAL adaptive physical
  * plan — the one AQE actually ran, with reused exchanges, runtime
  * join-strategy changes and coalesced reads visible. `Explain` prints
  * the initial plan (isFinalPlan=false), which hides exactly the
  * things an optimization round needs to verify (e.g. whether two
  * identical scan→explode→Exchange subtrees share one shuffle stage
  * at runtime).
  */
object ExplainFinal {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ExplainFinal <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; have ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val df = fn(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    // the executed plan of the LAST action on this dataframe; for a
    // noop write the write node wraps the adaptive plan
    val executed = df.queryExecution.executedPlan
    val adaptive = executed.collectFirst { case a: AdaptiveSparkPlanExec => a }
    println("== Final Plan (executed) ==")
    println(adaptive.map(_.executedPlan.toString).getOrElse(executed.toString))
    spark.stop()
  }
}
