package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Analytics.q1SalesPerMonth(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Analytics.queries ++ graft.queries.RelOps.queries ++
      graft.ops.Dedup.queries ++ graft.ops.Similarity.queries ++
      graft.ops.TextOps.queries ++ graft.ops.Multimodal.queries ++
      graft.streaming.EventsStream.queries ++ graft.queries.PipelineOps.queries ++
      graft.queries.ScaleOps.queries ++ graft.ops.AsOf.queries ++
      graft.queries.TemporalOps.queries ++ graft.queries.ProfileOps.queries ++
      graft.queries.ChangeOps.queries ++ graft.ops.TopK.queries ++
      graft.queries.ExtraOps.queries ++ graft.ops.CorpusOps.queries ++
      graft.ops.GraphOps.queries ++ graft.queries.BehaviorOps.queries ++
      graft.ops.TokenOps.queries ++ graft.queries.StatOps.queries ++
      graft.ops.SubstringDedup.queries ++ graft.ops.Boilerplate.queries ++
      graft.ops.DataSkipping.queries ++ graft.sources.SkippingFileIndex.queries ++
      graft.ops.DeletionVectors.queries ++ graft.ops.MergeOnRead.queries ++
      graft.ops.Classifier.queries ++ graft.ops.InvertedIndex.queries ++
      graft.ops.TableStats.queries ++
      graft.sources.GraftSink.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Analytics.oracleSql ++ graft.queries.RelOps.oracleSql ++
      graft.ops.Dedup.oracleSql ++ graft.ops.Similarity.oracleSql ++
      graft.ops.TextOps.oracleSql ++ graft.ops.Multimodal.oracleSql ++
      graft.streaming.EventsStream.oracleSql ++ graft.queries.PipelineOps.oracleSql ++
      graft.queries.ScaleOps.oracleSql ++ graft.ops.AsOf.oracleSql ++
      graft.queries.TemporalOps.oracleSql ++ graft.queries.ProfileOps.oracleSql ++
      graft.queries.ChangeOps.oracleSql ++ graft.ops.TopK.oracleSql ++
      graft.queries.ExtraOps.oracleSql ++ graft.ops.CorpusOps.oracleSql ++
      graft.ops.GraphOps.oracleSql ++ graft.queries.BehaviorOps.oracleSql ++
      graft.ops.TokenOps.oracleSql ++ graft.queries.StatOps.oracleSql ++
      graft.ops.SubstringDedup.oracleSql ++ graft.ops.Boilerplate.oracleSql ++
      graft.ops.DataSkipping.oracleSql ++ graft.sources.SkippingFileIndex.oracleSql ++
      graft.ops.DeletionVectors.oracleSql ++ graft.ops.MergeOnRead.oracleSql ++
      graft.ops.Classifier.oracleSql ++ graft.ops.InvertedIndex.oracleSql ++
      graft.ops.TableStats.oracleSql ++
      graft.sources.GraftSink.oracleSql
}
