package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: time j282's phases in isolation at sf0.1. */
object Probe282 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
      val edges = graft.Tables.eventsUs(spark, d)
        .select($"user_id", $"event_id", $"event_type", $"ts_us")
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNotNull)
        .groupBy($"prev_type".as("src"), $"event_type".as("dst"))
        .agg(count(lit(1)).as("wt"))
        .coalesce(1)
        .persist()
      t("edges materialize")(edges.count())
      val outW = edges.groupBy($"src").agg(sum($"wt").as("w_out")).coalesce(1).persist()
      t("outW")(outW.count())
      val nodes = edges.select($"src".as("node"))
        .union(edges.select($"dst")).distinct().coalesce(1).persist()
      val n = t("nodes count")(nodes.count())
      val U = 1000000000000L
      val base = 15L * U / (100L * n)
      var ranks = t("init ckpt")(nodes.withColumn("r", lit(U / n)).coalesce(1).localCheckpoint())
      for (i <- 1 to 8) {
        val contrib = edges.join(outW, "src")
          .join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
          .groupBy($"dst".as("node"))
          .agg(sum(expr("(r * wt) DIV w_out")).as("in_c"))
        val dangling = ranks
          .join(broadcast(outW.withColumnRenamed("src", "node")), Seq("node"), "left_anti")
          .agg(coalesce(sum($"r"), lit(0L)).as("dang"))
        val next = t(s"round $i")(nodes.join(broadcast(contrib), Seq("node"), "left")
          .crossJoin(broadcast(dangling))
          .select($"node",
            (lit(base) +
              expr(s"(85 * (COALESCE(in_c, 0) + dang DIV $n)) DIV 100")).as("r"))
          .coalesce(1)
          .localCheckpoint())
        graft.ops.TextOps.releaseCheckpoint(ranks)
        ranks = next
      }
      t("final")(ranks.count())
      edges.unpersist(); outW.unpersist(); nodes.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
