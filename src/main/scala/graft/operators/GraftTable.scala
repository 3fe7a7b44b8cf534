package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A keyed, partitioned parquet table — the physical form of the
  * reference's storage model (`(PartitionKey, RowKey)`-addressed rows,
  * `storage/azurestoragewrapper.py:115-116`): day-partitioned layout on
  * disk, key-level upserts via the [[KeyedTable]] MERGE layer, and
  * dynamic partition overwrite so a write only rewrites the partitions
  * it touches (the physical form of per-day import-once idempotency).
  *
  * At cluster scale the same code runs against object storage; the
  * partition column is the pruning axis (queries with a partition
  * predicate read only those directories) and should match the dominant
  * access pattern — the broadcast day for the reference workload.
  */
object GraftTable {

  /** Write `df` as a BUCKETED table: rows are hash-distributed into
    * `buckets` files by `bucketCols` and sorted within each bucket, and
    * the bucketing is recorded in the catalog — so a later equi-join or
    * aggregation on the bucket columns reads co-located data and plans
    * NO shuffle exchange (asserted in `BucketingSpec`). This is the
    * physical lever SCALE.md's fact-fact join row relies on: bucket both
    * fact tables on the join key once at write time, and every
    * subsequent join on that key is exchange-free regardless of size.
    */
  def writeBucketed(df: org.apache.spark.sql.DataFrame, table: String, path: String,
                    buckets: Int, bucketCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
}

final class GraftTable(spark: SparkSession, val path: String,
                       val keys: Seq[String], val partitionCol: String) {

  /** Idempotent create (K1): materializes the table directory and a
    * schema sidecar once. (An empty partitioned parquet write produces no
    * data files, so the sidecar is what lets `read` work pre-first-row.)
    */
  def createIfNotExists(schema: org.apache.spark.sql.types.StructType): this.type = {
    if (!exists) {
      // overwrite: `exists` just said there is NO committed data here —
      // at most an empty/partial directory from a crashed write, which
      // this create recovers by replacing
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
      java.nio.file.Files.writeString(schemaSidecar, schema.json)
    }
    this
  }

  private def schemaSidecar = java.nio.file.Paths.get(path, "_graft_schema.json")

  /** A table exists when its creation COMMITTED. `createIfNotExists`
    * writes the schema sidecar last, so the sidecar is the commit
    * marker; for externally-written tables (no sidecar) probe for
    * parquet data or a `_SUCCESS` marker anywhere under the root — a
    * bare directory left behind by a crashed write is NOT a table (it
    * would otherwise suppress the re-import forever).
    */
  def exists: Boolean =
    java.nio.file.Files.exists(schemaSidecar) || {
      def probe(f: java.io.File): Boolean = {
        val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        kids.exists(k => k.isFile &&
          (k.getName.endsWith(".parquet") || k.getName == "_SUCCESS")) ||
          kids.exists(k => k.isDirectory && probe(k))
      }
      probe(new java.io.File(path))
    }

  def read: DataFrame =
    if (java.nio.file.Files.exists(schemaSidecar)) {
      val schema = org.apache.spark.sql.types.DataType
        .fromJson(java.nio.file.Files.readString(schemaSidecar))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      spark.read.schema(schema).parquet(path)
    } else spark.read.parquet(path)

  /** Append rows for partitions not yet present (U2 import-once): the
    * existence check prunes to partition values, the write appends only
    * the new partitions.
    */
  def importOnce(incoming: DataFrame): this.type = {
    val existing = read.select(partitionCol).distinct()
    val fresh = incoming.join(existing, Seq(partitionCol), "left_anti")
    fresh.write.mode(SaveMode.Append).partitionBy(partitionCol).parquet(path)
    this
  }

  /** Key-level upsert-REPLACE (K4): merge updates into the stored table,
    * rewriting ONLY the partitions the updates touch (dynamic partition
    * overwrite — untouched day directories are never read or written).
    */
  def upsertReplace(updates: DataFrame, tiebreak: Seq[String] = Nil): this.type = {
    val touched = updates.select(partitionCol).distinct()
    val current = read.join(touched, Seq(partitionCol), "left_semi")
    val merged = KeyedTable.upsertReplace(
      current.withColumn("__v", lit(1)), updates.withColumn("__v", lit(2)),
      keys, "__v", tiebreak).drop("__v")
    writePartitions(merged.select(current.columns.map(col).toSeq: _*))
  }

  /** Insert-if-absent (K8): append only rows whose key is not yet
    * present — never reads back or rewrites existing files, so it is
    * cheap and idempotent at any scale (reference `server/etl.py:148-149`).
    */
  def insertIfAbsent(inserts: DataFrame): this.type = {
    val fresh = inserts.join(read.select(keys.map(col).toSeq: _*).distinct(),
      keys, "left_anti")
    fresh.write.mode(SaveMode.Append).partitionBy(partitionCol).parquet(path)
    this
  }

  /** Key-level upsert-MERGE (K3, non-default columns win). */
  def upsertMerge(updates: DataFrame, defaults: Map[String, Any]): this.type = {
    val touched = updates.select(partitionCol).distinct()
    val current = read.join(touched, Seq(partitionCol), "left_semi")
    val merged = KeyedTable.upsertMerge(current, updates, keys, defaults)
    writePartitions(merged.select(current.columns.map(col).toSeq: _*))
  }

  /** Keyed DELETE (K5): anti-join rewrite of only the touched partitions.
    * A partition whose every row is deleted yields no output rows, which
    * dynamic overwrite would silently skip — those partitions are instead
    * DROPPED at the metadata level (their directories deleted), so a
    * routine delete never rewrites untouched data. Collecting partition
    * VALUES to the driver is metadata-scale (bounded by the partition
    * count), not data-scale.
    */
  def deleteByKeys(deleteKeys: DataFrame): this.type = {
    val touched = read.join(deleteKeys, keys, "left_semi")
      .select(partitionCol).distinct()
    // partition-value joins must be NULL-SAFE: a null partition value is
    // legal (Hive default partition), and a null-unsafe semi/anti join
    // would silently exclude its surviving rows from the rewrite while
    // still dropping its directory — i.e. delete rows it was never asked
    // to delete
    val tp = touched.withColumnRenamed(partitionCol, "__tp")
    val current = read.join(tp, col(partitionCol) <=> col("__tp"), "left_semi")
    val remaining = KeyedTable.deleteByKeys(current, deleteKeys, keys)
    // DURABLY materialize BEFORE any file is dropped/overwritten: the
    // plan reads the very files this method mutates. A persist() barrier
    // is not durable — a lost executor's cached blocks would be
    // recomputed from the mutated directories, silently dropping
    // surviving rows. A staging write severs the lineage: any retry
    // re-reads the staging parquet, never the mutated table. (Point
    // `graft.staging.dir` at cluster storage for durability across
    // executor loss.)
    val staged = Staging.stage(remaining, "delete_barrier")
    val m = staged.df
    val mp = m.select(col(partitionCol).as("__mp")).distinct()
    val emptiedVals = touched
      .join(mp, col(partitionCol) <=> col("__mp"), "left_anti")
      .collect().map(r => Option(r.get(0)).map(_.toString))
    emptiedVals.foreach { v =>
      // Hive path encoding: special chars are %-escaped in directory
      // names and a null partition value has its own sentinel — a raw
      // "$col=$v" would miss both and leave the deleted rows on disk
      val dirName = v match {
        case Some(value) =>
          s"$partitionCol=" + org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(value)
        case None => s"$partitionCol=__HIVE_DEFAULT_PARTITION__"
      }
      val dir = java.nio.file.Paths.get(path, dirName)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq
          .sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete)
      }
    }
    if (!m.isEmpty) {
      // per-write option, NOT a session conf mutation: callers may rely
      // on their own overwrite semantics
      m.write.mode(SaveMode.Overwrite).option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol).parquet(path)
    }
    staged.delete()
    this
  }

  /** Overwrite touched partitions. The input plan READS this table, so it
    * is durably staged (see [[Staging]]) before the overwrite deletes any
    * source file — otherwise the write would consume files it is
    * replacing, and a non-durable barrier (persist) could recompute from
    * them after an executor loss.
    */
  private def writePartitions(df: DataFrame): this.type = {
    val staged = Staging.stage(df, "write_barrier")
    staged.df.write.mode(SaveMode.Overwrite).option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(path)
    staged.delete()
    this
  }

  /** COMPACTION — the small-files maintenance pass every incrementally
    * upserted table eventually needs (each upsert tick rewrites touched
    * partitions with the session's task parallelism, so a long-lived
    * table accumulates many small files per partition): hash-cluster
    * the whole table on the partition column so every partition
    * directory rewrites as ONE file (all rows of a partition key land
    * in one task). CONTENT-INVARIANT by construction — the rewrite
    * stages the table through the same write barrier every mutation
    * uses; only the file layout changes (q184 hash-checks the content,
    * the spec checks the file-count collapse). At scale this is the
    * per-partition OPTIMIZE job; `parallelism` bounds the rewrite's
    * task width.
    */
  def compact(parallelism: Int = 16): this.type = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    writePartitions(read.repartition(parallelism, col(partitionCol)))
  }

  /** Data file count (diagnostic; used by the compaction spec). */
  def dataFileCount: Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(path))
  }
}
