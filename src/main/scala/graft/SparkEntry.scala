package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * One `queries` entry per implemented operator from SURVEY.md §2; the
  * implementations live under `graft.ops`, grouped by operator family.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Aggregates.d1AggGroup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Sources.defs ++ ops.Relational.defs ++ ops.Aggregates.defs ++
      ops.Windows.defs ++ ops.Scalars.defs ++ ops.VectorOps.defs ++
      ops.TextOps.defs ++ ops.SearchOps.defs ++ ops.BucketOps.defs ++
      ops.AggExtOps.defs ++ ops.SyncOps.defs ++
      ops.StreamingOps.defs ++ ops.PipelineOps.defs ++ ops.CurationOps.defs ++
      ops.CorpusQualityOps.defs ++ ops.RankOps.defs ++ ops.FusionOps.defs ++
      ops.AnalyticsOps.defs ++ ops.NestedOps.defs ++ ops.Esql.defs ++
      ops.GeoOps.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * Convention (SURVEY.md §7.5#8): every table reference is spelled as a
    * relative parquet path `'<name>.parquet'`.
    */
  def oracleSql: Map[String, String] =
    ops.Sources.oracle ++ ops.Relational.oracle ++ ops.Aggregates.oracle ++
      ops.Windows.oracle ++ ops.Scalars.oracle ++ ops.VectorOps.oracle ++
      ops.TextOps.oracle ++ ops.SearchOps.oracle ++ ops.BucketOps.oracle ++
      ops.AggExtOps.oracle ++ ops.SyncOps.oracle ++
      ops.StreamingOps.oracle ++ ops.PipelineOps.oracle ++ ops.CurationOps.oracle ++
      ops.CorpusQualityOps.oracle ++ ops.RankOps.oracle ++ ops.FusionOps.oracle ++
      ops.AnalyticsOps.oracle ++ ops.NestedOps.oracle ++ ops.Esql.oracle ++
      ops.GeoOps.oracle
}
