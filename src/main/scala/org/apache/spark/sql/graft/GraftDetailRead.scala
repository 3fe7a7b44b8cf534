package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.GraftTable

/** `DESCRIBE DETAIL` as a METADATA TABLE (the Delta idiom, served like
  * `<table>__history`): `SELECT * FROM graft.db.t__detail` returns ONE
  * row of table-level facts — location, key/partition layout, current
  * version, live file count/bytes, partition count, constraint and
  * column-mapping state. Everything comes from the manifest and
  * sidecars (bounded by file COUNT, no data file opened), planned as a
  * [[LocalScan]] — zero distributed jobs. Rows materialize at scan
  * build, so each statement sees the state as of its own planning.
  */
final class GraftDetailTable(spark: SparkSession, gt: GraftTable)
    extends Table with SupportsRead {

  private val detailSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("location", StringType),
    StructField("format", StringType),
    StructField("keys", StringType),
    StructField("partitioning", StringType),
    StructField("version", LongType),
    StructField("num_files", LongType),
    StructField("size_bytes", LongType),
    StructField("num_partitions", LongType),
    StructField("num_checks", IntegerType),
    StructField("num_mapped_columns", IntegerType),
    StructField("num_dropped_columns", IntegerType),
    StructField("stats_columns", StringType),
    StructField("bloom_columns", StringType),
    StructField("evolved_columns", StringType)))

  override def name: String = s"graft_detail:${gt.path.replace('.', '_')}"
  override def schema: StructType = detailSchema
  override def capabilities: java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  private def partitioningDesc: String =
    if (gt.partitionCol == GraftTable.SyntheticPartition) {
      if (gt.partitionSrc.isEmpty) "unpartitioned"
      else {
        val xfs =
          if (gt.partitionXform.nonEmpty) gt.partitionXform
          else gt.partitionSrc.map(_ => "identity")
        gt.partitionSrc.zip(xfs).map {
          case (c, "identity") => c
          case (c, xf) => s"$xf($c)"
        }.mkString(",")
      }
    } else gt.partitionCol

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = detailSchema
        override def rows(): Array[InternalRow] = {
          val v = gt.currentVersion
          val files = if (v > 0) gt.liveFilesAt(v) else Seq.empty
          val bytes = files.map { f =>
            val p = java.nio.file.Paths.get(gt.path, f)
            if (java.nio.file.Files.exists(p)) java.nio.file.Files.size(p)
            else 0L
          }.sum
          val parts = files.map(_.split('/').dropRight(1).mkString("/"))
            .distinct.size
          val (cmap, hidden) = gt.columnMap
          def s(x: String) = UTF8String.fromString(x)
          val evolved = gt.declaredLogicalSchema.toSeq.flatMap(
            _.fields.filter(_.metadata.contains(GraftTable.EvolvedKey))
              .map(_.name))
          Array(InternalRow(
            s(gt.path.split('/').last), s(gt.path), s("parquet"),
            s(gt.keys.mkString(",")), s(partitioningDesc),
            v, files.size.toLong, bytes, parts.toLong,
            gt.checks.size, cmap.size, hidden.size,
            s(gt.statsCols.mkString(",")), s(gt.bloomCols.mkString(",")),
            s(evolved.mkString(","))))
        }
        override def description(): String = s"GraftDetailScan(${gt.path})"
      }
    }
}
