package org.apache.spark.sql.graft

import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.operators.GraftTable

/** NATIVE STREAMING WRITE into a graft catalog table —
  * `df.writeStream.toTable("graft.db.t")`, the Delta idiom, with
  * EXACTLY-ONCE epoch commits (round 11; closes the "foreachBatch
  * only" gap):
  *
  *   - tasks write their rows as parquet STAGING files under the
  *     table's `_graft_staging/stream_<queryId>/e<epoch>/` dir through
  *     Spark's own [[ParquetUtils.prepareWrite]] writer (task-side,
  *     distributed, no rows through the driver); each
  *     [[WriterCommitMessage]] carries only the staged file PATHS;
  *   - the driver's `commit(epochId, …)` applies the epoch through
  *     [[GraftTable.appendBatch]] — the `(appId = stream:<queryId>,
  *     batchId = epochId)` txn marker commits ATOMICALLY with the
  *     manifest, so a replayed epoch (the at-least-once crash window
  *     between an epoch's commit and its checkpoint write) SKIPS:
  *     exactly-once table effects, the [[GraftTable.mergeBatch]]
  *     discipline on the INSERT path. The staged files are re-read and
  *     land through the normal commit path (conform, CHECK
  *     constraints, MICROS footer stats, partition routing, zone
  *     maps) — one extra read+write of the EPOCH'S rows (incremental
  *     data, never the table), which is what buys every table
  *     invariant a hand-rolled task-side partition writer would have
  *     to re-implement;
  *   - `abort` deletes the epoch's staging; a crashed run's leftovers
  *     live under `_graft_staging/` and vacuum reclaims them.
  *
  * APPEND output mode only — complete/update modes need replace
  * semantics per epoch; use `foreachBatch` +
  * [[GraftTable.upsertReplaceBatch]]/[[GraftTable.mergeBatch]] for
  * keyed apply.
  */
final class GraftStreamingWrite(spark: SparkSession, gt: GraftTable,
                                queryId: String, inputSchema: StructType)
    extends StreamingWrite {

  private def epochDir(epochId: Long): java.nio.file.Path =
    java.nio.file.Paths.get(gt.path, "_graft_staging",
      s"stream_$queryId", s"e$epochId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    // driver-side: configure the parquet write support once (schema,
    // codec, rebase modes) and ship the hadoop conf to tasks
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = ParquetUtils.prepareWrite(spark.sessionState.conf, job,
      inputSchema, new ParquetOptions(Map.empty[String, String],
        spark.sessionState.conf))
    new GraftStreamWriterFactory(owf, inputSchema,
      java.nio.file.Paths.get(gt.path, "_graft_staging",
        s"stream_$queryId").toString,
      new SerializableConfiguration(job.getConfiguration))
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case m: GraftStreamCommitMessage => m.files
    }.flatten.toSeq
    if (files.nonEmpty) {
      val frame = spark.read.schema(inputSchema).parquet(files: _*)
      // a replayed epoch (<= the recorded txn id) skips — exactly-once.
      // retryOnConflict re-ENTERS on a lost OCC race, so a conflicting
      // winner that was a replay of this very epoch (a zombie instance
      // of the same query) is seen by the re-read txn state and skipped
      // rather than double-applied.
      GraftTable.retryOnConflict() {
        gt.appendBatch(s"stream:$queryId", epochId, frame)
      }
      ()
    }
    graft.operators.Fs.deleteTree(epochDir(epochId))
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    graft.operators.Fs.deleteTree(epochDir(epochId))
  }
}

final case class GraftStreamCommitMessage(files: Seq[String])
    extends WriterCommitMessage

/** BATCH form of the staged write — the V2 `BatchWrite` behind DYNAMIC
  * `INSERT OVERWRITE` (no V1 fallback exists for
  * `OverwritePartitionsDynamic`): tasks stage parquet under
  * `_graft_staging/batch_<writeId>/` exactly like the streaming epochs
  * (attempt-unique names, messages carry paths only), and the driver's
  * commit re-lands the staged rows through `apply` — here
  * [[GraftTable.overwritePartitions]], one atomic touched-partition
  * commit through the normal path (conform, CHECK constraints, MICROS
  * footer stats, zone maps). Abort (or a crash) leaves only staging,
  * which vacuum reclaims.
  */
final class GraftBatchStageWrite(spark: SparkSession, gt: GraftTable,
                                 inputSchema: StructType, label: String,
                                 apply: org.apache.spark.sql.DataFrame => Unit)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.BatchWrite {

  private val stageDir = java.nio.file.Paths.get(gt.path, "_graft_staging",
    s"${label}_${java.util.UUID.randomUUID().toString.take(12)}")

  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = ParquetUtils.prepareWrite(spark.sessionState.conf, job,
      inputSchema, new ParquetOptions(Map.empty[String, String],
        spark.sessionState.conf))
    new GraftBatchWriterFactory(owf, inputSchema, stageDir.toString,
      new SerializableConfiguration(job.getConfiguration))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case m: GraftStreamCommitMessage => m.files
    }.flatten.toSeq
    if (files.nonEmpty) {
      val frame = spark.read.schema(inputSchema).parquet(files: _*)
      GraftTable.retryOnConflict() { apply(frame) }
    }
    graft.operators.Fs.deleteTree(stageDir)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    graft.operators.Fs.deleteTree(stageDir)
  }
}

/** Batch twin of [[GraftStreamWriterFactory]] — same one-file-per-task
  * staging writer under a fixed directory.
  */
final class GraftBatchWriterFactory(owf: OutputWriterFactory,
                                    schema: StructType, dir: String,
                                    conf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new GraftStreamDataWriter(owf, schema, dir, partitionId, taskId, conf)
}

/** Task-side writer factory: each task writes ONE parquet staging file
  * (task-attempt-unique name — speculative attempts cannot collide;
  * only the winning attempt's message reaches `commit`, the loser's
  * `abort` deletes its file).
  */
final class GraftStreamWriterFactory(owf: OutputWriterFactory,
                                     schema: StructType, streamDir: String,
                                     conf: SerializableConfiguration)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftStreamDataWriter(owf, schema,
      s"$streamDir/e$epochId", partitionId, taskId, conf)
}

final class GraftStreamDataWriter(owf: OutputWriterFactory,
                                  schema: StructType, dir: String,
                                  partitionId: Int, taskId: Long,
                                  conf: SerializableConfiguration)
    extends DataWriter[InternalRow] {

  private var path: String = _
  private var out: org.apache.spark.sql.execution.datasources.OutputWriter = _
  private var count = 0L

  private def open(): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val tac = new TaskAttemptContextImpl(conf.value,
      new TaskAttemptID(new TaskID(new org.apache.hadoop.mapreduce.JobID(
        "graftstream", 0), TaskType.MAP, partitionId),
        (taskId % Int.MaxValue).toInt))
    path = s"$dir/p${partitionId}_t$taskId.parquet"
    out = owf.newInstance(path, schema, tac)
  }

  override def write(row: InternalRow): Unit = {
    if (out == null) open()
    out.write(row)
    count += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) { out.close(); out = null }
    GraftStreamCommitMessage(if (count > 0) Seq(path) else Nil)
  }

  override def abort(): Unit = {
    if (out != null) { out.close(); out = null }
    if (path != null) {
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path)); ()
    }
  }

  override def close(): Unit =
    if (out != null) { out.close(); out = null }
}
