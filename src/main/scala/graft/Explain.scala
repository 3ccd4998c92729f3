package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection helper: `runMain graft.Explain <query> [sfDir]`
  * prints the formatted physical plan for a registered query —
  * the "explain and iterate until it's the plan you'd want" loop. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; have ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
