package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset profiling — the first thing a training-data pipeline runs
  * against a new 100 TB drop: per-column null ratio, approximate distinct
  * count (HLL), min/max, and for numerics mean/stddev.
  *
  * ONE pass over the data: every per-column stat is a partial-aggregable
  * expression, so all columns' stats ride in a single global aggregate
  * (map-side combined, one tiny shuffle). The result is reshaped to
  * one-row-per-column on the driver — bounded by schema width, not data.
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val isNum = f.dataType.isInstanceOf[NumericType]
      Seq(
        count(lit(1)).as(s"${f.name}__n"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        approx_count_distinct(c).as(s"${f.name}__distinct"),
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"),
        (if (isNum) round(avg(c.cast("double")), 6)
         else lit(null).cast("double")).as(s"${f.name}__mean"),
        (if (isNum) round(stddev_samp(c.cast("double")), 6)
         else lit(null).cast("double")).as(s"${f.name}__sd"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    def get[T](name: String, f: Int => T, i: Int): Option[T] =
      if (r.isNullAt(i)) None else Some(f(i))
    val rows = fields.map { f =>
      val base = r.fieldIndex(s"${f.name}__n")
      val n = r.getLong(base).toDouble
      (f.name, f.dataType.simpleString,
        if (n == 0) 0.0 else r.getLong(base + 1) / n,
        r.getLong(base + 2),
        get(s"${f.name}__min", r.getString, base + 3),
        get(s"${f.name}__max", r.getString, base + 4),
        get(s"${f.name}__mean", r.getDouble, base + 5),
        get(s"${f.name}__sd", r.getDouble, base + 6))
    }
    rows.toDF("column", "dtype", "null_ratio", "approx_distinct",
      "min", "max", "mean", "sd")
  }
}
