package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the executed plan of one declared query.
  * Usage: runMain graft.tools.ExplainDump <queryName> [sfDir]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.count()
    println("=== executedPlan ===")
    println(df.queryExecution.executedPlan.toString)
    println("=== formatted ===")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
