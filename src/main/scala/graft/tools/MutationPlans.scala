package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Dev tool: the touched-partition READ plans of the r15 mutation-path
  * change, on a real partitioned GraftTable — what doMerge /
  * upsertReplace / deleteByKeys / updateWhere / deleteWhereRewrite now
  * scan. BEFORE: the pre-r15 shape — a null-safe left-semi join of the
  * whole table against the touched-partition frame (every partition's
  * files enumerated; filtering happens after the scan). AFTER: the
  * [[graft.operators.GraftTable]] `prunedToTouched` shape — literal
  * null-safe equalities on the partition column, pruned at planning
  * time (the scan's PartitionFilters carry the predicate and only the
  * touched partitions' files are listed).
  * Usage: MutationPlans <sfDir>
  */
object MutationPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Files.createTempDirectory("graft_mplans_").toString
    val rows = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("pk", col("user_id") % 4)
    val t = new graft.operators.GraftTable(spark, s"$base/t",
      Seq("event_id"), "pk")
    t.createIfNotExists(org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, user_id BIGINT, cents BIGINT, pk BIGINT"))
    t.upsertReplace(rows)

    // the touched set: partitions holding a key the source matches
    // (here: pk 0 and 1 only)
    val touchedRows = t.read.filter(col("pk") <= 1)
      .select(col("pk"), col("pk").cast("string")).distinct().collect()

    println("---- touched-partition read, BEFORE (null-safe left-semi join)")
    val tp = t.read.filter(col("pk") <= 1).select(col("pk").as("__tp")).distinct()
    t.read.join(tp, col("pk") <=> col("__tp"), "left_semi")
      .explain("formatted")

    println("---- touched-partition read, AFTER (literal null-safe equalities)")
    t.read.filter(touchedRows.map(r =>
        col("pk") <=> lit(r.get(0))).reduce(_ || _))
      .explain("formatted")

    graft.operators.Fs.deleteTree(base)
    spark.stop()
  }
}
