package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the "expectations" layer a
  * lakehouse pipeline runs before publishing a table (uniqueness, null,
  * range, domain and referential checks). Each check compiles to ONE
  * aggregate or anti-join over the frame; the report is a union of
  * single-row results, so validating a 100 TB table costs one scan per
  * independent check (Catalyst merges the scan for the pure-aggregate
  * checks since they share the same child) and never collects data —
  * only the per-check violation COUNTS surface.
  */
object Quality {

  sealed trait Check { def name: String }

  /** `column` must never be null. */
  final case class NotNull(column: String) extends Check {
    val name = s"not_null($column)"
  }

  /** The column tuple must be unique across the table. Violations =
    * rows beyond the first of each duplicated tuple.
    */
  final case class Unique(columns: Seq[String]) extends Check {
    val name = s"unique(${columns.mkString(",")})"
  }

  /** Non-null values must lie in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range($column,$lo,$hi)"
  }

  /** Non-null values must belong to the literal domain. */
  final case class InSet(column: String, values: Seq[String]) extends Check {
    val name = s"in_set($column)"
  }

  /** Every value of `column` must exist in `dimCol` of `dim`
    * (referential integrity; anti-join, broadcast when dim is small).
    */
  final case class RefIntegrity(column: String, dim: DataFrame, dimCol: String,
                                dimName: String) extends Check {
    val name = s"ref($column->$dimName.$dimCol)"
  }

  /** Validate all checks; returns (check, n_violations, passed) — one
    * row per check, `passed = n_violations == 0`.
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check is required")
    checks.map { c =>
      val viol: DataFrame = c match {
        case NotNull(colName) =>
          df.agg(sum(when(col(colName).isNull, 1L).otherwise(0L)).as("v"))
        case Unique(cols) =>
          // SQL COUNT(DISTINCT ...) convention: rows with ANY null key
          // column are excluded from the uniqueness check entirely (null
          // keys are NotNull's business, and SQL UNIQUE constraints treat
          // nulls as incomparable). n_violations = duplicate rows among
          // the fully-non-null key tuples.
          val nonNull = cols.map(col(_).isNotNull).reduce(_ && _)
          df.agg((sum(when(nonNull, 1L).otherwise(0L)) -
            countDistinct(col(cols.head), cols.tail.map(col): _*)).as("v"))
        case InRange(colName, lo, hi) =>
          df.agg(sum(when(col(colName).isNotNull &&
            (col(colName) < lo || col(colName) > hi), 1L).otherwise(0L)).as("v"))
        case InSet(colName, values) =>
          df.agg(sum(when(col(colName).isNotNull &&
            !col(colName).isin(values: _*), 1L).otherwise(0L)).as("v"))
        case RefIntegrity(colName, dim, dimCol, _) =>
          df.filter(col(colName).isNotNull)
            .join(dim.select(col(dimCol).as(colName)), Seq(colName), "left_anti")
            .agg(count(lit(1)).as("v"))
      }
      // "check_name", not "check": CHECK is reserved in ANSI/DuckDB
      viol.select(lit(c.name).as("check_name"),
        coalesce(col("v"), lit(0L)).as("n_violations"),
        (coalesce(col("v"), lit(0L)) === 0).as("passed"))
    }.reduce(_ unionByName _)
  }
}
