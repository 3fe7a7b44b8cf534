package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, UnresolvedWith}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewCatalog}

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
  * The substituted plan resolves in the VIEW's OWN persisted
  * catalog+namespace context: unqualified table names inside the
  * stored SQL are qualified against the view's `currentCatalog` /
  * `currentNamespace` before re-entering the fixed point (CTE names
  * defined by the view itself stay untouched), so a reader in any
  * session context sees the tables the view's author named — never a
  * same-named table from the reader's context. Filters and pruning
  * push into the underlying table scans exactly as if the user had
  * inlined the query, and a view over a view expands recursively (a
  * cyclic view fails analysis at the iteration cap rather than
  * looping forever).
  *
  * Installed by `spark.sql.extensions=graft.ext.GraftExtensions`
  * (build-time — analyzer rules cannot be added to a live session);
  * [[graft.GraftSession.local]], `graft.Verify` and `graft.Bench`
  * sessions all carry it.
  */
class GraftResolveViews(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      // batch relations only: a view has no streaming-source form —
      // substituting into readStream would smuggle a batch subquery
      // under a streaming plan; let the normal resolution error surface
      case u: UnresolvedRelation if !u.isStreaming =>
        substitute(u.multipartIdentifier).getOrElse(u)
    }

  private def catalogManager = spark.sessionState.catalogManager

  private def viewCatalogNamed(name: String): Option[ViewCatalog] =
    scala.util.Try(catalogManager.catalog(name)).toOption.collect {
      case vc: ViewCatalog => vc
    }

  /** (catalog name, namespace+view parts) for a relation reference,
    * expanding 1-part names with the session's current namespace the
    * same way table resolution does.
    */
  private def addressOf(parts: Seq[String]): (String, Seq[String]) =
    if (parts.length >= 2 && catalogManager.isCatalogRegistered(parts.head))
      (parts.head, parts.tail)
    else if (parts.length == 1)
      (catalogManager.currentCatalog.name,
        catalogManager.currentNamespace.toSeq ++ parts)
    else (catalogManager.currentCatalog.name, parts)

  private def substitute(parts: Seq[String]): Option[LogicalPlan] = {
    val (catName, rest) = addressOf(parts)
    if (rest.isEmpty) return None
    viewCatalogNamed(catName).flatMap { vc =>
      val ident = Identifier.of(rest.dropRight(1).toArray, rest.last)
      if (!vc.viewExists(ident)) None
      else {
        val v = vc.loadView(ident)
        // the analyzer's CTE substitution batch ran BEFORE this rule —
        // a WITH inside the view would never bind its own names, so
        // substitute CTEs here, then qualify what remains (genuinely
        // external table references)
        val parsed = qualify(
          org.apache.spark.sql.catalyst.analysis.CTESubstitution(
            spark.sessionState.sqlParser.parsePlan(v.query())), v)
        val aliased =
          if (v.columnAliases() == null || v.columnAliases().isEmpty) parsed
          else UnresolvedSubqueryColumnAliases(
            v.columnAliases().toSeq, parsed)
        Some(SubqueryAlias((catName +: rest.dropRight(1)) :+ rest.last,
          aliased))
      }
    }
  }

  /** Qualify the view SQL's UNQUALIFIED relation references against
    * the view's persisted catalog+namespace (names the view defines
    * itself as CTEs are left alone; 2-part names gain the catalog when
    * their head is not one). Subquery expressions are walked too.
    */
  private def qualify(plan: LogicalPlan, v: View): LogicalPlan = {
    val ctes = plan.collect {
      case w: UnresolvedWith => w.cteRelations.map(_._1)
    }.flatten.toSet
    def qualifyParts(parts: Seq[String]): Seq[String] = parts match {
      case Seq(one) if ctes.contains(one) => parts
      case Seq(one) =>
        (v.currentCatalog() +: v.currentNamespace().toSeq) :+ one
      case many if catalogManager.isCatalogRegistered(many.head) => many
      case many => v.currentCatalog() +: many
    }
    def walk(p: LogicalPlan): LogicalPlan = {
      val relationed = p.transformDown {
        case u: UnresolvedRelation if !u.isStreaming =>
          u.copy(multipartIdentifier = qualifyParts(u.multipartIdentifier))
      }
      relationed.transformAllExpressions {
        case se: SubqueryExpression => se.withNewPlan(walk(se.plan))
      }
    }
    walk(plan)
  }
}
