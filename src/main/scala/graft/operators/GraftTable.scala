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

/** @note VERSIONED: every mutation commits a new manifest under
  *       `_graft_log/` listing the data files LIVE in that version;
  *       data files are only ever ADDED, never deleted by a mutation
  *       (the Delta/Iceberg discipline — replaced files stay on disk
  *       for [[GraftTable.readAt]] time travel until [[GraftTable.vacuum]]
  *       reclaims them). Single writer per table, as in the reference's
  *       orchestrator model.
  */
final class GraftTable(spark: SparkSession, val path: String,
                       val keys: Seq[String], val partitionCol: String) {

  /** Idempotent create (K1): materializes the table directory, a
    * schema sidecar, and version 1 (the empty manifest) once. (An empty
    * partitioned parquet write produces no data files, so the sidecar is
    * what lets `read` work pre-first-row.)
    */
  def createIfNotExists(schema: org.apache.spark.sql.types.StructType): this.type = {
    if (!exists) {
      // overwrite: `exists` just said there is NO committed data here —
      // at most an empty/partial directory from a crashed write, which
      // this create recovers by replacing
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
      java.nio.file.Files.writeString(schemaSidecar, schema.json)
      commitManifest(Seq.empty)
    }
    this
  }

  // ------------------------------------------------ version log (history)

  private def logDir = java.nio.file.Paths.get(path, "_graft_log")

  private def manifestPath(v: Long) = logDir.resolve(f"v$v%06d.json")

  /** All committed versions, ascending (empty for a legacy/no-log table). */
  def versions: Seq[Long] = {
    val d = logDir.toFile
    Option(d.listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        val n = f.getName
        if (n.startsWith("v") && n.endsWith(".json"))
          scala.util.Try(n.stripPrefix("v").stripSuffix(".json").toLong).toOption
        else None
      }.sorted.toSeq
  }

  /** Latest committed version (0 = no version log yet). */
  def currentVersion: Long = versions.lastOption.getOrElse(0L)

  /** Relative data-file paths LIVE in `v` (manifest must exist). */
  private def manifestFiles(v: Long): Seq[String] = {
    val p = manifestPath(v)
    require(java.nio.file.Files.exists(p), s"version $v has no manifest at $p")
    val txt = java.nio.file.Files.readString(p)
    // manifest format: {"version":N,"files":["rel/path", ...]} with \-escaped
    // quotes/backslashes in paths (Hive %-escaping keeps them rare)
    val body = txt.substring(txt.indexOf('[') + 1, txt.lastIndexOf(']'))
    if (body.trim.isEmpty) Seq.empty
    else body.split("\",\\s*\"").toSeq
      .map(_.stripPrefix("\"").stripSuffix("\"")
        .replace("\\\"", "\"").replace("\\\\", "\\"))
  }

  /** Atomically commit the next version's manifest; returns its number. */
  private def commitManifest(files: Seq[String]): Long = {
    java.nio.file.Files.createDirectories(logDir)
    val v = currentVersion + 1
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val json = files.sorted.map(f => "\"" + esc(f) + "\"")
      .mkString(s"""{"version":$v,"files":[""", ",", "]}")
    val tmp = logDir.resolve(s".tmp_v$v")
    java.nio.file.Files.writeString(tmp, json)
    java.nio.file.Files.move(tmp, manifestPath(v),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** Every committed data file under the table root, path-relative. */
  private def listDataFiles(): Seq[String] = {
    val root = java.nio.file.Paths.get(path)
    def walk(f: java.io.File): Seq[String] =
      if (f.isDirectory) {
        if (f.getName == "_graft_log") Seq.empty
        else Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      } else if (f.getName.endsWith(".parquet"))
        Seq(root.relativize(f.toPath).toString)
      else Seq.empty
    walk(new java.io.File(path))
  }

  /** Upgrade a legacy table (files but no log) in place: its current
    * physical listing becomes version 1, so history starts at "now".
    */
  private def ensureBaseline(): Unit =
    if (currentVersion == 0L) { commitManifest(listDataFiles()); () }

  /** The Hive directory name for a partition VALUE (None = null). */
  private def partitionDirName(v: Option[String]): String = v match {
    case Some(value) => s"$partitionCol=" +
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(value)
    case None => s"$partitionCol=__HIVE_DEFAULT_PARTITION__"
  }

  private def readFiles(files: Seq[String]): DataFrame =
    if (files.isEmpty) {
      val schema = org.apache.spark.sql.types.DataType
        .fromJson(java.nio.file.Files.readString(schemaSidecar))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      val base = spark.read.option("basePath", path)
      val withSchema =
        if (java.nio.file.Files.exists(schemaSidecar)) {
          val schema = org.apache.spark.sql.types.DataType
            .fromJson(java.nio.file.Files.readString(schemaSidecar))
            .asInstanceOf[org.apache.spark.sql.types.StructType]
          base.schema(schema)
        } else base
      withSchema.parquet(files.map(f => s"$path/$f"): _*)
    }

  /** TIME TRAVEL: the table exactly as of committed version `v`. */
  def readAt(v: Long): DataFrame = readFiles(manifestFiles(v))

  /** Reclaim history: keep the last `keepVersions` manifests, delete
    * every data file referenced ONLY by dropped manifests. The
    * storage-cost bound a versioned table needs — history is otherwise
    * unbounded (every upsert tick keeps its replaced files).
    */
  def vacuum(keepVersions: Int = 1): this.type = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val vs = versions
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    if (drop.nonEmpty) {
      val liveSet = keep.flatMap(manifestFiles).toSet
      val dead = drop.flatMap(manifestFiles).toSet -- liveSet
      dead.foreach { f =>
        val p = java.nio.file.Paths.get(path, f)
        java.nio.file.Files.deleteIfExists(p)
        // local-FS runs: Hadoop writes a .<name>.crc checksum sibling
        val crc = p.resolveSibling("." + p.getFileName.toString + ".crc")
        java.nio.file.Files.deleteIfExists(crc); ()
      }
      drop.foreach { v => java.nio.file.Files.deleteIfExists(manifestPath(v)); () }
      // prune now-empty partition directories (an all-history partition
      // leaves an empty dir behind once its files are reclaimed)
      def prune(f: java.io.File): Boolean = { // true = f was removed
        if (!f.isDirectory || f.getName == "_graft_log") false
        else {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(prune)
          val empty = Option(f.listFiles()).forall(_.isEmpty)
          if (empty && f.toPath != java.nio.file.Paths.get(path)) f.delete()
          else false
        }
      }
      Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
        .foreach(prune)
    }
    this
  }

  /** Append-only write + manifest commit: write `df`'s rows as NEW
    * files, then commit a manifest where every file under a TOUCHED
    * partition from the previous version is replaced by the new files
    * (an emptied partition simply contributes none — no directory
    * deletion, the old files stay for time travel). `touchedVals` must
    * cover every partition value whose content `df` redefines.
    */
  private def commitRewrite(df: DataFrame,
                            touchedVals: Seq[Option[String]]): this.type = {
    ensureBaseline()
    val before = listDataFiles().toSet
    if (!df.isEmpty)
      df.write.mode(SaveMode.Append).partitionBy(partitionCol).parquet(path)
    val added = listDataFiles().filterNot(before)
    val touchedDirs = touchedVals.map(partitionDirName).toSet
    val kept = manifestFiles(currentVersion)
      .filterNot(f => touchedDirs.exists(d => f.startsWith(d + "/")))
    commitManifest(kept ++ added)
    this
  }

  /** Append-only append + manifest commit (no partition replaced). */
  private def commitAppend(df: DataFrame): this.type = {
    ensureBaseline()
    val before = listDataFiles().toSet
    if (!df.isEmpty)
      df.write.mode(SaveMode.Append).partitionBy(partitionCol).parquet(path)
    val added = listDataFiles().filterNot(before)
    commitManifest(manifestFiles(currentVersion) ++ added)
    this
  }

  /** The partition VALUES (as Hive directory strings) present in `df` —
    * metadata-scale collect, bounded by the partition count.
    */
  private def partitionValsOf(df: DataFrame): Seq[Option[String]] =
    df.select(col(partitionCol).cast("string")).distinct()
      .collect().map(r => Option(r.getString(0))).toSeq

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
    if (currentVersion > 0L) readAt(currentVersion)
    else if (java.nio.file.Files.exists(schemaSidecar)) {
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
    commitAppend(fresh)
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
    commitAppend(fresh)
  }

  /** Key-level upsert-MERGE (K3, non-default columns win). */
  def upsertMerge(updates: DataFrame, defaults: Map[String, Any]): this.type = {
    val touched = updates.select(partitionCol).distinct()
    val current = read.join(touched, Seq(partitionCol), "left_semi")
    val merged = KeyedTable.upsertMerge(current, updates, keys, defaults)
    writePartitions(merged.select(current.columns.map(col).toSeq: _*))
  }

  /** Keyed DELETE (K5): anti-join rewrite of only the touched
    * partitions, committed as a new version. A partition whose every
    * row is deleted simply contributes no files to the new manifest —
    * no directory deletion, no dynamic-overwrite skip trap, and the
    * pre-delete state stays readable via [[readAt]]. Collecting
    * partition VALUES to the driver is metadata-scale (bounded by the
    * partition count), not data-scale.
    */
  def deleteByKeys(deleteKeys: DataFrame): this.type = {
    val touched = read.join(deleteKeys, keys, "left_semi")
      .select(partitionCol).distinct()
    // partition-value joins must be NULL-SAFE: a null partition value is
    // legal (Hive default partition), and a null-unsafe semi join would
    // silently exclude its surviving rows from the rewrite while the
    // manifest still drops the partition's old files — i.e. delete rows
    // it was never asked to delete
    val tp = touched.withColumnRenamed(partitionCol, "__tp")
    val current = read.join(tp, col(partitionCol) <=> col("__tp"), "left_semi")
    val remaining = KeyedTable.deleteByKeys(current, deleteKeys, keys)
    // stage once: the remaining rows feed the append write, and the
    // touched values collect feeds the manifest — one computation
    val staged = Staging.stage(remaining, "delete_barrier")
    commitRewrite(staged.df, partitionValsOf(touched))
    staged.delete()
    this
  }

  /** Rewrite touched partitions as a NEW VERSION: the rows append as
    * fresh files and the manifest swaps the touched partitions' old
    * files for them — the files the input plan reads are never deleted
    * (they now belong to history), so recomputation after an executor
    * loss is always safe. Staged once because both the write and the
    * touched-partition collect consume the plan.
    */
  private def writePartitions(df: DataFrame): this.type = {
    val staged = Staging.stage(df, "write_barrier")
    commitRewrite(staged.df, partitionValsOf(staged.df))
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

  /** LIVE data file count — the current version's manifest size for a
    * versioned table (historical files don't count; they are storage,
    * not table). Physical walk only for legacy no-log tables.
    * (Diagnostic; used by the compaction spec.)
    */
  def dataFileCount: Int =
    if (currentVersion > 0L) manifestFiles(currentVersion).size
    else {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(path))
    }
}
