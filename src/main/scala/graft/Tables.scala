package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the harness corpus (`/root/testdata/sf{N}/{name}.parquet`).
  *
  * Plain `spark.read.parquet` — filters, projections and limits the caller
  * stacks on top are pushed into the scan by Catalyst (`PushedFilters` /
  * `ReadSchema` in the formatted plan), which is the Spark-native form of
  * the reference's server-side `filter=`/`select=`/`num_results=`
  * pushdown (reference `storage/azurestoragewrapper.py:63,412`).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** The `events` table stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark cannot map to TimestampType. With
    * `spark.sql.legacy.parquet.nanosAsLong` the column arrives as a raw
    * nanosecond long; `ts div 1000` (integer division — a double division
    * would lose precision above 2^53) truncates to microseconds, exactly
    * what DuckDB's nanos→micros cast does on the oracle side.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      // TIMESTAMP(NANOS) parquet read raw via nanosAsLong
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // naive micros read by an untuned session (GraftSession.tune
      // disables NTZ inference; this covers foreign sessions) — the
      // cast reinterprets the wall-clock value in the UTC session zone,
      // the same instants the tuned read produces
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
