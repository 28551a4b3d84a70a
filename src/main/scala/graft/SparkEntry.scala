package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 expressed over
  * the driver testdata; [[oracleSql]] carries the DuckDB-equivalent SQL for
  * the hash-compare correctness gate (omitted for operators whose hash
  * pipelines are not portable to DuckDB — those get rows-only checks).
  */
object SparkEntry {

  private def registry: Seq[QDef] =
    RelationalQueries.all ++ TextQueries.all ++ SimilarityQueries.all ++ SketchQueries.all ++ CvQueries.all ++ DedupQueries.all ++ PipelineQueries.all ++ CurationQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_revenue_nation")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
