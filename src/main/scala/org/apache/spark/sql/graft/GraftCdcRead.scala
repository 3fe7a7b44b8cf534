package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.GraftTable

/** CDC-MODE STREAMING (the Delta `readChangeFeed` semantic, exposed the
  * Iceberg way — as a `<table>__changes` metadata table on the
  * catalog): each micro-batch emits the ROW-LEVEL change feed of its
  * version range — `_change_type` ∈ insert / delete / update_preimage /
  * update_postimage ([[GraftTable.readChangesRowsBetween]], the q232
  * classification) — so DELETE-only commits and deletion-vector commits
  * stream as explicit delete rows instead of refusing the file-diff
  * source. The first batch from a fresh checkpoint emits the snapshot
  * as inserts (the Delta CDF convention).
  *
  * Execution shape: the change frame of a range is a key full-outer
  * join, which the DSv2 partition protocol cannot express directly —
  * each batch STAGES its change rows as parquet under
  * `_graft_cdc/` (O(changed rows), distributed write) and plans the
  * batch as a plain parquet scan over the staged files; committed
  * batches' staging reclaims on `commit(end)`, crashed runs' leftovers
  * are age-gated away by vacuum. Batch (non-streaming) SQL reads:
  * `VERSION AS OF v` anchors "every change since v"; an UN-anchored
  * read defaults to the full history — the pinned head snapshot as
  * inserts (net-change semantics; the stream's own fresh-checkpoint
  * convention). STORAGE COST, documented deliberately: the un-anchored
  * default stages a full copy of the head snapshot under `_graft_cdc/`
  * per head version polled — repeated polls of one version reuse one
  * staging, superseded `batch_v0_*` stagings reclaim via vacuum's age
  * gate. Anchor with `VERSION AS OF` (O(changed rows) staging) for
  * routine incremental consumption; the un-anchored form is the
  * bootstrap read.
  */
final class GraftCdcTable(spark: SparkSession, gt: GraftTable,
                          batchSince: Option[Long] = None)
    extends Table with SupportsRead {

  val cdcSchema: StructType = StructType(
    gt.read.schema.fields
      .filterNot(f => gt.partitionCol == GraftTable.SyntheticPartition &&
        f.name == gt.partitionCol) :+ // synthetic __gp stays hidden
      StructField("_change_type", StringType, nullable = false))

  // `VERSION AS OF v` on the changes table anchors a BATCH change feed:
  // "every change since version v" (the Delta table_changes semantic),
  // with the end pinned at load time for a stable result
  private val batchUntil: Long = gt.currentVersion

  override def name: String = s"graft_cdc:${gt.path.replace('.', '_')}" +
    batchSince.map(v => s"@since$v").getOrElse("")
  override def schema: StructType = cdcSchema
  // un-anchored identifiers serve BOTH: the micro-batch change stream
  // and (since round 10) a default-anchored batch read — every change
  // since the beginning, which under net-change semantics is the
  // pinned head snapshot as inserts (the stream's own fresh-checkpoint
  // convention)
  override def capabilities: java.util.Set[TableCapability] =
    if (batchSince.isDefined) java.util.EnumSet.of(TableCapability.BATCH_READ)
    else java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // streaming option (Delta readChangeFeed parity, our
    // exclusive-anchor convention): .option("startingVersion", v)
    // starts the CHANGE stream at "every change since v" instead of
    // the fresh-checkpoint snapshot-as-inserts
    val startingVersion = Option(options.get("startingVersion")).map { raw =>
      val v = scala.util.Try(raw.trim.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"startingVersion must be a version number, got '$raw'"))
      require(v >= 0, s"startingVersion must be >= 0, got $v")
      v
    }
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = cdcSchema
        override def toBatch: Batch = batchSince.orElse(Some(0L)) match {
          case Some(since) =>
            // stage the (since, until] change frame and serve it as a
            // plain parquet batch — the same execution shape as one
            // stream micro-batch. The dir is DETERMINISTIC per range
            // and never stream-deleted (batch scans get no commit
            // hook): repeated polls of the same range reuse one
            // staging instead of accumulating, and vacuum's age-gated
            // sweep reclaims ranges the head has moved past. Writers
            // NEVER write the deterministic name directly: each stages
            // under a private tmp dir and atomically RENAMES it in, so
            // its presence implies a complete file set — two concurrent
            // first readers race the rename, the loser discards its tmp
            // and reuses the winner's (identical, the range is pinned).
            val cols = cdcSchema.fields.map(_.name).toSeq
            val parent = new Path(gt.path, "_graft_cdc")
            val dir = new Path(parent,
              s"batch_v${since}_v$batchUntil").toString
            val dirPath = java.nio.file.Paths.get(new Path(dir).toUri.getPath)
            // a dir WITHOUT _SUCCESS is a crashed legacy (pre-rename-
            // discipline) staging: nothing can be mid-reading it (scans
            // only ever plan over complete stagings), reclaim and restage
            if (java.nio.file.Files.exists(dirPath) &&
              !java.nio.file.Files.exists(dirPath.resolve("_SUCCESS")))
              graft.operators.Fs.deleteTree(dirPath)
            if (!java.nio.file.Files.exists(dirPath)) {
              val tmp = java.nio.file.Paths.get(
                new Path(parent, s".btmp_${java.util.UUID.randomUUID()
                  .toString.take(8)}").toUri.getPath)
              // since = 0 is the default (un-anchored) batch feed:
              // every change since the beginning, which under net-
              // change semantics is the pinned head snapshot as
              // inserts — the stream's fresh-checkpoint convention
              val frame =
                if (since == 0L) {
                  val snap =
                    if (batchUntil == 0L)
                      spark.createDataFrame(
                        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                        gt.read.schema)
                    else gt.readAt(batchUntil)
                  snap.withColumn("_change_type", lit("insert"))
                } else gt.readChangesRowsBetween(since, batchUntil)
              frame
                .select(cols.map(org.apache.spark.sql.functions.col): _*)
                .write.mode("overwrite").parquet(tmp.toString)
              try java.nio.file.Files.move(tmp, dirPath,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              catch { // lost the rename race — the winner's staging serves
                case _: java.nio.file.FileAlreadyExistsException |
                     _: java.nio.file.DirectoryNotEmptyException |
                     _: java.nio.file.AccessDeniedException =>
                  graft.operators.Fs.deleteTree(tmp)
              }
            } else {
              // refresh the reuse clock: vacuum's orphan sweep is
              // age-gated on dir mtime, and a poll must not have its
              // files reclaimed mid-scan because the staging is old.
              // Try-guarded: the dir can vanish between the exists
              // check and the touch (concurrent vacuum) — the scan
              // then fails on the missing files with a clear cause
              // rather than aborting planning here
              scala.util.Try(java.nio.file.Files.setLastModifiedTime(
                dirPath, java.nio.file.attribute.FileTime.fromMillis(
                  System.currentTimeMillis())))
              ()
            }
            GraftCdcMicroBatchStream.scanOver(spark, cdcSchema, dir).toBatch
          case None => throw new IllegalStateException("unreachable")
        }
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftCdcMicroBatchStream(spark, gt, cdcSchema, startingVersion)
      }
    }
  }
}

object GraftCdcMicroBatchStream {
  private[graft] def scanOver(spark: SparkSession, cdcSchema: StructType,
                              dir: String): Scan = {
    val fi = new InMemoryFileIndex(spark, Seq(new Path(dir)),
      Map.empty[String, String], Some(cdcSchema))
    ParquetScanBuilder(spark, fi, cdcSchema, cdcSchema,
      GraftSqlRead.emptyOptions).build()
  }
}

final class GraftCdcMicroBatchStream(spark: SparkSession, gt: GraftTable,
                                     cdcSchema: StructType,
                                     startingVersion: Option[Long] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowCap = Some(gt.currentVersion)
  }

  override def latestOffset(): Offset =
    GraftOffset(availableNowCap.getOrElse(gt.currentVersion))
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()
  // fresh checkpoint: snapshot-as-inserts (offset 0) or
  // .option("startingVersion", v) — every change SINCE v (exclusive,
  // like the batch `VERSION AS OF v` anchor)
  override def initialOffset(): Offset =
    GraftOffset(startingVersion.getOrElse(0L))
  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.trim.toLong)

  private def cdcRoot = new Path(gt.path, "_graft_cdc")
  // per-STREAM-INSTANCE nonce: two concurrent CDC streams with
  // coinciding offsets must not share a staging dir (one's commit()
  // would delete files the other is mid-reading); replans WITHIN this
  // instance still reuse (same nonce + _SUCCESS). A restart is a new
  // instance — its predecessor's dirs age out via vacuum.
  private val streamNonce = java.util.UUID.randomUUID().toString.take(8)
  private def stageDir(s: Long, e: Long) =
    new Path(cdcRoot, s"v${s}_v${e}_$streamNonce").toString

  // staged ranges of THIS run, reclaimed as their batches commit
  private val staged =
    scala.collection.mutable.Map.empty[Long, String] // endVersion -> dir

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].v
    val e = end.asInstanceOf[GraftOffset].v
    if (e <= s) return Array.empty
    require(s == 0L || gt.hasVersion(s),
      s"table ${gt.path}: CDC stream resume offset $s predates the vacuum " +
        "horizon — its history was reclaimed; restart from a fresh " +
        "checkpoint (full snapshot) or stop vacuuming under live streams")
    val cols = cdcSchema.fields.map(_.name).toSeq
    val df =
      if (s == 0L) // snapshot-as-inserts (fresh checkpoint)
        gt.readAt(e).withColumn("_change_type", lit("insert"))
      else gt.readChangesRowsBetween(s, e)
    val dir = stageDir(s, e)
    // The engine may plan the same batch more than once; an overwrite
    // would swap file names under an earlier plan's partitions. The
    // change frame of a pinned (s, e] is deterministic, so a COMPLETE
    // staging (_SUCCESS present) is simply reused; only absent or
    // partial (crashed) stagings write.
    val done = java.nio.file.Files.exists(java.nio.file.Paths
      .get(new Path(dir).toUri.getPath, "_SUCCESS"))
    if (!done)
      df.select(cols.map(col): _*)
        .write.mode("overwrite").parquet(dir)
    staged.synchronized { staged(e) = dir }
    scanOver(dir).toBatch.planInputPartitions()
  }

  private def scanOver(dir: String): Scan =
    GraftCdcMicroBatchStream.scanOver(spark, cdcSchema, dir)

  override def createReaderFactory(): org.apache.spark.sql.connector.read.PartitionReaderFactory = {
    // parquet reader factories are partition-agnostic: one built over
    // the staging root serves every batch's staged files
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(gt.path, "_graft_cdc"))
    scanOver(cdcRoot.toString).toBatch.createReaderFactory()
  }

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[GraftOffset].v
    val done = staged.synchronized {
      val d = staged.filter(_._1 <= e); d.keys.foreach(staged.remove); d.values.toSeq
    }
    done.foreach(d => graft.operators.Fs.deleteTree(java.nio.file.Paths.get(d)))
  }

  // the engine does not guarantee commit() for the FINAL batch of a run
  // (AvailableNow stops right after) — reclaim everything this run
  // staged: a committed batch never replans, an uncommitted one
  // restages idempotently on restart
  override def stop(): Unit = {
    val all = staged.synchronized { val d = staged.values.toSeq; staged.clear(); d }
    all.foreach(d => graft.operators.Fs.deleteTree(java.nio.file.Paths.get(d)))
  }
}
