package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reference-shaped ingest fixtures (FIXTURES.md §A), checked into the
  * library resources and staged to a deterministic directory so BOTH the
  * Spark queries and the DuckDB oracle read the exact same bytes.
  *
  * Staging layout (all under [[root]]):
  *   - `genres.csv`, `epg_*.csv`, `*_chunks.txt` — the raw fixture files
  *   - `stage/genres_raw.parquet`   — genres CSV, string columns
  *   - `stage/epg_raw.parquet`      — both EPG day CSVs, string columns
  *   - `stage/toplist_chunks.parquet`, `stage/tracker_chunks.parquet`
  *     — one raw page chunk per row (post-fetch, pre-parse)
  *
  * The CSV decode itself (`;` dialect, header, lenient charset) happens
  * ONCE here via [[LenientCsv]]; everything downstream — safe casts, key
  * derivation, genre enrich, joins, cascade — is computed independently
  * by the Spark operators and by the oracle SQL over the staged parquet.
  */
object Fixtures {

  val root: String = "/tmp/graft_fixtures"
  val stageDir: String = s"$root/stage"

  private val resourceNames = Seq(
    "genres.csv", "epg_2021_03_05.csv", "epg_2021_03_06.csv",
    "toplist_chunks.txt", "tracker_chunks.txt")

  /** Copy the classpath fixtures to [[root]] (overwrite: the repo copy is
    * the source of truth). Idempotent per call.
    */
  def materialize(): Path = {
    val dir = Paths.get(root)
    Files.createDirectories(dir)
    resourceNames.foreach { n =>
      val in = getClass.getResourceAsStream(s"/graftfixtures/$n")
      require(in != null, s"fixture resource missing: $n")
      try Files.copy(in, dir.resolve(n), StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
    }
    dir
  }

  /** Stage the raw fixture tables as parquet for the oracle (once per
    * JVM). Returns the stage directory.
    */
  def stage(spark: SparkSession): String = synchronized {
    if (!staged) {
      materialize()
      genresCsv(spark).coalesce(1).write.mode("overwrite")
        .parquet(s"$stageDir/genres_raw.parquet")
      epgCsv(spark).coalesce(1).write.mode("overwrite")
        .parquet(s"$stageDir/epg_raw.parquet")
      chunks(spark, "toplist_chunks.txt").coalesce(1).write.mode("overwrite")
        .parquet(s"$stageDir/toplist_chunks.parquet")
      chunks(spark, "tracker_chunks.txt").coalesce(1).write.mode("overwrite")
        .parquet(s"$stageDir/tracker_chunks.parquet")
      staged = true
    }
    stageDir
  }
  @volatile private var staged = false

  def genresCsv(spark: SparkSession): DataFrame = {
    materialize()
    LenientCsv.read(spark, s"$root/genres.csv")
  }

  /** Both EPG days in one frame (the per-day split is the orchestrator's
    * concern — `PartitionKey` is derived from `beginn` anyway).
    */
  def epgCsv(spark: SparkSession): DataFrame = {
    materialize()
    LenientCsv.read(spark, s"$root/epg_2021_03_0[56].csv")
  }

  def epgCsvDay(spark: SparkSession, day: String): DataFrame = {
    materialize()
    LenientCsv.read(spark, s"$root/epg_$day.csv")
  }

  /** One raw page chunk per row, column `chunk` (the post-fetch shape the
    * page parsers consume).
    */
  def chunks(spark: SparkSession, name: String): DataFrame = {
    materialize()
    spark.read.text(s"$root/$name").withColumnRenamed("value", "chunk")
  }
}
