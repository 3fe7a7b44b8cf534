package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog}

/** Analyzer rule: resolve relations that name a PERSISTED V2 VIEW
  * (Spark 4's `ViewCatalog` protocol — [[graft.sources.GraftCatalog]]
  * implements it) by substituting the view's stored SQL, parsed and
  * wrapped under the view's alias — vanilla Spark 4.1 ships the
  * ViewCatalog interface but wires no SQL read path to it (the
  * session-catalog resolver throws `MISSING_CATALOG_ABILITY` for every
  * other catalog), so this rule supplies the missing resolution the
  * same way Iceberg's view extensions do, against the public
  * extension API.
  *
  * The substituted plan re-enters the analyzer's fixed point: filters
  * and pruning push into the underlying table scans exactly as if the
  * user had inlined the query, and a view over a view expands
  * recursively (a cyclic view fails analysis at the iteration cap
  * rather than looping forever).
  *
  * Installed by `spark.sql.extensions=graft.ext.GraftExtensions`
  * (build-time — analyzer rules cannot be added to a live session);
  * [[graft.GraftSession.local]], `graft.Verify` and `graft.Bench`
  * sessions all carry it.
  */
class GraftResolveViews(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.multipartIdentifier.length >= 2 =>
        substitute(u.multipartIdentifier).getOrElse(u)
    }

  private def substitute(parts: Seq[String]): Option[LogicalPlan] = {
    val cm = spark.sessionState.catalogManager
    val (catName, rest) =
      if (parts.length >= 3 && cm.isCatalogRegistered(parts.head))
        (parts.head, parts.tail)
      else if (parts.length == 2 && cm.isCatalogRegistered(parts.head))
        (parts.head, parts.tail)
      else (cm.currentCatalog.name, parts)
    val vcOpt = scala.util.Try(cm.catalog(catName)).toOption.collect {
      case vc: ViewCatalog => vc
    }
    vcOpt.flatMap { vc =>
      if (rest.isEmpty) None
      else {
        val ident = Identifier.of(rest.dropRight(1).toArray, rest.last)
        if (!vc.viewExists(ident)) None
        else {
          val v = vc.loadView(ident)
          val parsed = spark.sessionState.sqlParser.parsePlan(v.query())
          val aliased =
            if (v.columnAliases() == null || v.columnAliases().isEmpty) parsed
            else UnresolvedSubqueryColumnAliases(
              v.columnAliases().toSeq, parsed)
          Some(SubqueryAlias(
            (catName +: rest.dropRight(1)) :+ rest.last, aliased))
        }
      }
    }
  }
}
