package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: phase costs of the shared near-dup pair pipeline. */
object Probe2 {
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
      val docs = graft.Tables.documents(spark, d)
      t("docs scan")(docs.select($"doc_id").count())
      val sh0 = docs
        .select($"doc_id", split($"text", " ").as("toks"))
        .filter(size($"toks") >= 3)
        .select($"doc_id", explode(expr(
          """array_distinct(transform(sequence(1, size(toks) - 2),
            |  i -> xxhash64(concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2)))))""".stripMargin))
          .as("sh"))
      t("shingles count")(sh0.count())
      val sh = sh0.persist()
      t("shingles persist fill")(sh.count())
      val hot = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
        .filter($"df" > 1000L).select($"sh")
      val shf = sh.join(broadcast(hot), Seq("sh"), "left_anti")
      val ns = shf.groupBy($"doc_id").agg(count(lit(1)).as("ns"))
      t("ns agg")(ns.count())
      val pairs = shf.as("a")
        .join(shf.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      t("pairs (self-join+agg)")(pairs.count())
      val out = pairs
        .join(ns.select($"doc_id".as("d1"), $"ns".as("n1")), "d1")
        .join(ns.select($"doc_id".as("d2"), $"ns".as("n2")), "d2")
        .withColumn("jac", $"inter" / ($"n1" + $"n2" - $"inter"))
      t("full out")(out.count())
      t("full out 2nd")(out.count())
      // variant A: posting-list pair generation (one exchange on sh, pairs row-local)
      val posts = shf.groupBy($"sh").agg(sort_array(collect_list($"doc_id")).as("ds"))
        .filter(size($"ds") >= 2)
      val pairsA = posts.select(explode(expr(
        "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds)), y -> struct(x AS d1, y AS d2))))")).as("p"))
        .groupBy($"p.d1".as("d1"), $"p.d2".as("d2")).agg(count(lit(1)).as("inter"))
      t("pairsA (posting list)")(pairsA.count())
      t("pairsA 2nd")(pairsA.count())
      // variant C: shuffled-hash self-join
      val pairsC = shf.as("a").hint("SHUFFLE_HASH")
        .join(shf.as("b").hint("SHUFFLE_HASH"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      t("pairsC (shuffled hash)")(pairsC.count())
      t("pairsC 2nd")(pairsC.count())
      // sanity: identical pair multisets
      println("[probe] A-vs-orig diff = " + pairsA.unionAll(pairs).groupBy($"d1", $"d2", $"inter").agg(count(lit(1)).as("c")).filter($"c" =!= 2).count())
      sh.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
