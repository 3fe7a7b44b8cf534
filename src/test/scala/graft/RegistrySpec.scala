package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants: the driver consumes `SparkEntry.queries` as a
  * Map, so a duplicated query name would silently SHADOW an earlier
  * query (its oracle row would "pass" by running the wrong plan).
  */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique — nothing is shadowed in the Map") {
    val names = Queries.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicated query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size == names.size)
  }

  test("every query carries an oracle (no weaker rows-only checks)") {
    val missing = Queries.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle SQL: ${missing.mkString(", ")}")
  }

  test("oracle SQL references only tables the driver creates views for") {
    val known = Set("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
    // staged fixture parquet paths (IngestQueries) are allowed: they are
    // absolute /tmp paths the oracle reads directly, not view names
    val tablePattern = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)\\b".r
    val sqlKeywords = Set("unnest", "range", "generate_series", "read_parquet")
    Queries.all.flatMap(q => q.oracle.map(q.name -> _)).foreach { case (name, sql) =>
      // strip CTE definitions: names introduced by WITH are legal targets
      val cteNames = "(?i)([a-z_][a-z0-9_]*)\\s+AS\\s*(?:MATERIALIZED\\s*)?\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      tablePattern.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        assert(known.contains(t) || cteNames.contains(t) || sqlKeywords.contains(t)
            || sql.contains(s"'$t") || t.startsWith("tmp"),
          s"$name references unknown table '$t'")
      }
    }
  }
}
