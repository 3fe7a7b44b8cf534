package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Dev probe for the round-12 statement surfaces: what does vanilla
  * Spark 4.1 do TODAY against the graft catalog for (1) MERGE WITH
  * SCHEMA EVOLUTION, (2) CREATE VIEW / SELECT-through-view, (3) SHOW
  * PARTITIONS, (4) INSERT INTO with an extra source column, (5)
  * TIMESTAMP AS OF?
  */
object R12Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_r12").toString
    spark.conf.set("spark.sql.catalog.g12", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g12.root", base)
    spark.sql("""CREATE TABLE g12.db.t (k BIGINT, v BIGINT, pk BIGINT)
      PARTITIONED BY (pk) TBLPROPERTIES ('keys'='k')""")
    spark.range(0, 100).selectExpr("id AS k", "id*10 AS v", "id % 4 AS pk")
      .createOrReplaceTempView("src")
    spark.sql("INSERT INTO g12.db.t (k, v, pk) SELECT k, v, pk FROM src")

    def probe(tag: String)(body: => Any): Unit =
      try println(s"== $tag OK: ${body}")
      catch { case e: Throwable =>
        println(s"== $tag FAIL ${e.getClass.getSimpleName}: " +
          e.getMessage.linesIterator.take(3).mkString(" | "))
      }

    spark.range(0, 10).selectExpr("id AS k", "id+1 AS v", "id % 4 AS pk",
      "concat('x', id) AS note").createOrReplaceTempView("msrc")
    probe("merge-evolve-insertstar") {
      spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO g12.db.t t USING msrc s
        ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT *""")
      spark.sql("SELECT count(note) FROM g12.db.t").collect()(0).getLong(0)
    }
    probe("merge-evolve-updatestar") {
      spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO g12.db.t t USING msrc s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *""")
      spark.sql("SELECT count(note) FROM g12.db.t").collect()(0).getLong(0)
    }
    probe("merge-evolve-setexplicit") {
      spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO g12.db.t t USING msrc s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET t.note = s.note
        WHEN NOT MATCHED THEN INSERT *""")
      spark.sql("SELECT count(note) FROM g12.db.t").collect()(0).getLong(0)
    }
    probe("create-view") {
      spark.sql("CREATE VIEW g12.db.v AS SELECT k, v FROM g12.db.t WHERE v > 50")
      "created"
    }
    probe("read-view") {
      spark.sql("SELECT count(*) FROM g12.db.v").collect()(0).getLong(0)
    }
    probe("show-partitions") {
      spark.sql("SHOW PARTITIONS g12.db.t").collect().mkString(",")
    }
    probe("insert-extra-col-confoff") {
      spark.sql("INSERT INTO g12.db.t SELECT k, v, pk, concat('e', k) AS extra2 FROM src LIMIT 5")
      "inserted"
    }
    spark.conf.set("spark.graft.schema.autoMerge", "true")
    probe("insert-byname-extra-col") {
      spark.sql("INSERT INTO g12.db.t BY NAME SELECT k, v, pk, concat('e', k) AS extra3 FROM src WHERE k < 5")
      spark.sql("SELECT count(extra3) FROM g12.db.t").collect()(0).getLong(0)
    }
    probe("writeTo-append-extra-col") {
      spark.range(0, 5).selectExpr("id + 1000 AS k", "id AS v",
        "id % 4 AS pk", "concat('w', id) AS extra4")
        .writeTo("g12.db.t").append()
      spark.sql("SELECT count(extra4) FROM g12.db.t").collect()(0).getLong(0)
    }
    probe("insert-positional-wrongnames-automerge") {
      spark.sql("INSERT INTO g12.db.t SELECT k AS a, v AS b, pk AS c FROM src WHERE k > 90")
      "inserted (BAD if silent)"
    }
    probe("insert-positional-samenames-automerge") {
      spark.sql("INSERT INTO g12.db.t SELECT k, v, pk FROM src WHERE k = 50")
      "inserted"
    }
    spark.conf.set("spark.graft.schema.autoMerge", "false")
    probe("timestamp-as-of") {
      spark.sql("SELECT count(*) FROM g12.db.t TIMESTAMP AS OF '2099-01-01'")
        .collect()(0).getLong(0)
    }
    probe("describe-detail-shape") {
      spark.sql("SELECT * FROM g12.db.t__history LIMIT 2").columns.mkString(",")
    }
    spark.stop()
  }
}
