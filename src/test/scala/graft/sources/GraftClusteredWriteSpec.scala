package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Opt-in clustered writes (round 12, the 100 TB small-file lever):
  * `spark.graft.write.clusterByPartition = true` rebalances a
  * mutation's rows by partition value before the file write, so each
  * output task holds whole partitions — one file per cold partition
  * instead of one per (task × partition). Content-identical either
  * way; default off so local/small mutations pay no shuffle.
  */
class GraftClusteredWriteSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val root = Files.createTempDirectory("graft_cw").toString
    val cat = s"gcw_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def filesPerPartition(root: String, t: String): Map[String, Int] = {
    val dir = java.nio.file.Paths.get(s"$root/db/$t")
    val out = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    Files.walk(dir).forEach { p =>
      val rel = dir.relativize(p).toString
      if (rel.endsWith(".parquet") && !rel.startsWith("_")) {
        val part = rel.split('/').dropRight(1).mkString("/")
        out(part) += 1
      }
    }
    out.toMap
  }

  test("clustered writes land ~one file per partition; unclustered " +
    "writes fan out per task; contents identical") {
    val (cat, root) = freshCatalog()
    for (t <- Seq("off", "on")) {
      spark.sql(s"""CREATE TABLE $cat.db.$t (k BIGINT, v BIGINT, pk BIGINT)
        PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    }
    // 8 input splits × 3 partition values
    spark.range(0, 3000, 1, 8).selectExpr("id AS k", "id * 2 AS v",
      "id % 3 AS pk").createOrReplaceTempView("cw_src")
    spark.sql(s"INSERT INTO $cat.db.off SELECT k, v, pk FROM cw_src")
    spark.conf.set("spark.graft.write.clusterByPartition", "true")
    try spark.sql(s"INSERT INTO $cat.db.on SELECT k, v, pk FROM cw_src")
    finally spark.conf.unset("spark.graft.write.clusterByPartition")
    val off = filesPerPartition(root, "off")
    val on = filesPerPartition(root, "on")
    assert(on.keySet == off.keySet && on.keySet.size == 3)
    assert(on.values.forall(_ == 1),
      s"clustered write must land one file per partition, got $on")
    assert(off.values.sum > on.values.sum,
      s"unclustered write should fan out per task: off=$off on=$on")
    // identical contents
    val a = spark.sql(s"SELECT k, v, pk FROM $cat.db.off").collect().toSet
    val b = spark.sql(s"SELECT k, v, pk FROM $cat.db.on").collect().toSet
    assert(a == b && a.size == 3000)
  }
}
