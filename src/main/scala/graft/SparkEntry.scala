package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The queries/oracle registry (280 entries) lives in [[Queries]] (core
  * relational), [[EventQueries]] (JSON + event-time windows/streaming),
  * [[ExtQueries]] (dedup / similarity / text analysis), [[RelQueries]],
  * [[AnalyticsQueries]], [[TokenQueries]], [[FilterQueries]],
  * [[MlQueries]], [[CurateQueries]] (curation + multimodal) and
  * [[IngestQueries]] (the GraftTable storage layer, the DSv2 catalog
  * SQL/streaming surface and the ingestion capstones).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the five-table star join with broadcast dimensions (SURVEY §2.D).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_star_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
