package graft.tools

import org.apache.spark.sql.SparkSession

/** Empirical probe: which declared-schema WIDENINGS Spark 4.1's parquet
  * readers serve over narrower file types (the basis for the
  * metadata-only ALTER COLUMN TYPE lattice — see
  * [[graft.operators.GraftTable]] type widening).
  */
object WidenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("widen").toString
    Seq(1, 2, 3).toDF("x").write.parquet(s"$d/i")        // INT32
    Seq(1.5f, 2.5f).toDF("f").write.parquet(s"$d/f")     // FLOAT
    Seq(1.toShort).toDF("s").write.parquet(s"$d/s")      // INT16
    Seq(java.sql.Date.valueOf("2020-01-02")).toDF("dt")
      .write.parquet(s"$d/d")                            // DATE
    def tryRead(path: String, ddl: String): Unit =
      try {
        val r = spark.read.schema(ddl).parquet(path).collect().toSeq
        println(s"OK   $ddl -> $r")
      } catch { case e: Throwable =>
        println(s"FAIL $ddl -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").take(140))
      }
    tryRead(s"$d/i", "x BIGINT")
    tryRead(s"$d/i", "x DOUBLE")
    tryRead(s"$d/i", "x DECIMAL(20,0)")
    tryRead(s"$d/s", "s INT")
    tryRead(s"$d/s", "s BIGINT")
    tryRead(s"$d/f", "f DOUBLE")
    tryRead(s"$d/d", "dt TIMESTAMP_NTZ")
    println("--- row-based reader ---")
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    tryRead(s"$d/i", "x BIGINT")
    tryRead(s"$d/f", "f DOUBLE")
    spark.stop()
  }
}
