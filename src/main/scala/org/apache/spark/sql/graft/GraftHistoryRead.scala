package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.GraftTable

/** `DESCRIBE HISTORY` as a METADATA TABLE (the Iceberg idiom, like
  * `<table>__changes`): `SELECT * FROM graft.db.t__history` serves
  * [[GraftTable.history]] — one row per retained version with the
  * commit clock, kind, delta sizes and marker kinds. Metadata-scale by
  * construction (bounded by the version count, no data files touched),
  * so the scan is a [[LocalScan]]: the engine plans it as a local table
  * scan, no distributed job. Rows materialize lazily at scan build, so
  * each statement sees the history as of its own planning.
  */
final class GraftHistoryTable(spark: SparkSession, gt: GraftTable)
    extends Table with SupportsRead {

  private val historySchema: StructType = gt.history.schema

  override def name: String = s"graft_history:${gt.path.replace('.', '_')}"
  override def schema: StructType = historySchema
  override def capabilities: java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = historySchema
        // a LocalTableScanExec's rows: history is a driver-local frame
        // (toDF over per-version manifest metadata), so executeCollect
        // runs no job
        override def rows(): Array[InternalRow] =
          gt.history.queryExecution.executedPlan.executeCollect()
        override def description(): String = s"GraftHistoryScan(${gt.path})"
      }
    }
}
