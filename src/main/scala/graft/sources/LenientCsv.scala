package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's CSV ingestion contract (SURVEY §2.A S3/S4):
  * `;`-delimited, excel dialect, header row, lenient UTF-8 decode
  * (`errors='ignore'`, reference `server/etl.py:89-92`), and a load that
  * NEVER fails on malformed rows — unknown columns dropped, missing
  * columns defaulted downstream via safe_cast.
  */
object LenientCsv {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", ";")
      .option("encoding", "UTF-8")
      .option("mode", "PERMISSIVE")     // malformed rows → nulls, not errors
      .option("enforceSchema", "false")
      .csv(path)

  /** Staging-cache fetch (reference `server/etl.py:31,73,80-81`): the
    * download is skipped when the staged file already exists. HTTP work
    * is confined to the driver-side ingest staging layer — its output is
    * immediately a distributed DataFrame; executors never fetch.
    */
  def fetchToStaging(url: java.net.URL, staging: java.nio.file.Path): java.nio.file.Path = {
    if (!java.nio.file.Files.exists(staging)) {
      val in = url.openStream()
      try java.nio.file.Files.copy(in, staging)
      finally in.close()
    }
    staging
  }
}
