package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time one or more declared queries at sf0.1 (3 reps each,
  * bench-identical session settings) without paying a full Bench run —
  * the inner loop for single-query optimization work.
  * Usage: runMain graft.tools.TimeQ <queryName> [more...] */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args; _ <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(f"[timeq] $q ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
