package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Dev probe: do two graft tables partitioned on the same key join
  * WITHOUT a shuffle exchange (storage-partitioned join)?
  */
object SpjProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_spj").toString
    spark.conf.set("spark.sql.catalog.sp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sp.root", base)
    Seq("a", "b").foreach { t =>
      spark.sql(s"""CREATE TABLE sp.db.$t (k BIGINT, v BIGINT, pk BIGINT)
        PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
      spark.range(0, 4000)
        .selectExpr("id AS k", s"id * 10 AS v", "id % 4 AS pk")
        .createOrReplaceTempView(s"src_$t")
      spark.sql(s"INSERT INTO sp.db.$t (k, v, pk) SELECT k, v, pk FROM src_$t")
    }
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def run(tag: String, sql: String): Unit = {
        val df = spark.sql(sql)
        val n = df.collect().length
        val plan = df.queryExecution.executedPlan.toString
        val shuffles = "Exchange hashpartitioning".r
          .findAllIn(plan).length + "ShuffleQueryStage".r.findAllIn(plan).length
        println(s"== $tag rows=$n shuffles=$shuffles " +
          s"keyed=${plan.contains("KeyGroupedPartitioning") ||
            !plan.contains("Exchange")}")
        if (args.contains("--explain")) println(plan)
      }
      run("fact-fact-join", """SELECT a.k, a.v, b.v AS v2
        FROM sp.db.a a JOIN sp.db.b b ON a.pk = b.pk AND a.k = b.k""")
      run("groupby-pk", """SELECT pk, sum(v) AS s FROM sp.db.a GROUP BY pk""")
      // hidden bucket[8] tables joined on the bucket SOURCE column
      Seq("ba", "bb").foreach { t =>
        spark.sql(s"""CREATE TABLE sp.db.$t (k BIGINT, v BIGINT)
          PARTITIONED BY (bucket(8, k)) TBLPROPERTIES ('keys'='k')""")
        spark.sql(s"INSERT INTO sp.db.$t (k, v) SELECT k, v FROM src_a")
      }
      run("bucket-join", """SELECT a.k, a.v, b.v AS v2
        FROM sp.db.ba a JOIN sp.db.bb b ON a.k = b.k""")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
    graft.operators.Fs.deleteTree(base)
    spark.stop()
  }
}
