package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted plans for many queries in one JVM.
  * Usage: runMain graft.tools.MultiExplain <outDir> <suffix> <q1> [q2...] */
object MultiExplain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0); val suf = args(1); val names = args.drop(2)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      try {
        val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        df.count()
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$suf.txt"),
          txt.getBytes("UTF-8"))
        println(s"[me] $n ok")
      } catch { case e: Throwable => println(s"[me] $n FAILED: $e") }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
