package graft.operators

import org.apache.spark.sql.DataFrame

/** Durable materialization of intermediates via staging parquet.
  *
  * Two jobs in one utility:
  *
  *   1. Multi-consumer intermediates (Dedup posting tables): run the
  *      producing plan ONCE and let every consumer read the staged file.
  *      A `persist()` would leak into the shared session and is memory-
  *      bounded; a staging file is disk-bounded and spill-free.
  *   2. Read-then-mutate barriers ([[GraftTable]] upsert/delete): the
  *      merge plan reads the very files the write replaces, so the merged
  *      result must be DURABLY materialized before any file is touched.
  *      `persist()` is NOT durable — on a cluster a lost executor discards
  *      its cached blocks and Spark recomputes them from the already-
  *      mutated directories, silently dropping rows. A staging write has
  *      no lineage back to the table files: recomputation re-reads the
  *      staging parquet, never the mutated table.
  *
  * Root selection: `graft.staging.dir` if set (point it at job-scoped
  * cluster storage — HDFS/S3 — for durability across executor loss),
  * else local tmp. Each JVM stages under its own `jvm_<pid>_<nonce>`
  * subdir so exit cleanup removes only this JVM's files, never a shared
  * root another job still reads.
  *
  * Lifecycle: every staging root this JVM creates is tracked in
  * [[roots]]; a single shutdown hook deletes them all (covering the case
  * where `graft.staging.dir` changes mid-JVM — each distinct session
  * root is registered, not just the first). Callers whose staged frame
  * has a known last consumer should call [[Staged.delete]] eagerly
  * instead of waiting for exit: a long-lived session constructing many
  * operators otherwise accumulates disk until shutdown (each stage costs
  * one parquet copy of the intermediate until deleted).
  */
object Staging {

  /** A staged intermediate: `df` reads the staging parquet; [[delete]]
    * removes it once the last consumer has run.
    */
  final case class Staged(df: DataFrame, path: String) {
    /** Eagerly remove the staging files (Hadoop FS — works for local tmp
      * and cluster roots alike). Safe to call more than once.
      */
    def delete(): Unit = Staging.delete(df.sparkSession, path)
  }

  private val sessionId: String =
    s"jvm_${java.lang.ProcessHandle.current().pid()}_${java.util.UUID.randomUUID().toString.take(8)}"

  /** Every session root this JVM has created; the single shutdown hook
    * iterates the whole set.
    */
  private val roots = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def registerRoot(dir: String): Unit = {
    roots.add(dir)
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        roots.forEach(d => rm(new java.io.File(d)))
      }))
  }

  private def sessionRoot(spark: org.apache.spark.sql.SparkSession): String = {
    val root = spark.conf.getOption("graft.staging.dir")
      .getOrElse(sys.props("java.io.tmpdir") + "/graft_stage")
    s"$root/$sessionId"
  }

  /** Write `df` to a fresh staging parquet under the session root and
    * return a frame reading it back (plus the path, for eager cleanup).
    */
  def stage(df: DataFrame, hint: String): Staged = {
    val spark = df.sparkSession
    val dir = sessionRoot(spark)
    val path = s"$dir/${hint}_${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("overwrite").parquet(path)
    registerRoot(dir)
    Staged(spark.read.parquet(path), path)
  }

  private def delete(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true): Unit
  }
}
