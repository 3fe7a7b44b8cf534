package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.sources.{GraftCatalog, GraftMaterializedViews}

/** TRANSPARENT MATERIALIZED-VIEW REWRITE (the classic warehouse
  * optimization): a user aggregate
  *
  * {{{ SELECT user_id, sum(cents), count(*) FROM cat.db.ev GROUP BY user_id }}}
  *
  * that exactly matches a REGISTERED, FULLY-FRESH materialized view
  * over the same base is answered from the view's STATE table —
  * O(groups) read — instead of re-aggregating the corpus, without the
  * query naming the view. At 100 TB this turns the hottest rollups
  * from a full scan + shuffle into a metadata-gated point read of
  * pre-aggregated state.
  *
  * The gate is deliberately conservative — the rewrite fires ONLY when
  * the results are PROVABLY IDENTICAL:
  *
  *   - the state's txn anchor EQUALS the base's current version (fully
  *     fresh; a stale view never silently answers) AND the scan is not
  *     time-travel-pinned to any other version;
  *   - the mview is the plain single-table shape (no row filter, no
  *     dims, no derived keys) and the query has no WHERE below the
  *     aggregate (a `Filter` between `Aggregate` and the relation
  *     simply fails the match);
  *   - group keys are exactly the view's keys (as a set);
  *   - every aggregate maps onto exact state: sum/avg/min/max over the
  *     INTEGRAL column of a registered unfiltered measure, count(*),
  *     count(col). Approximate families (HLL dcount) never rewrite —
  *     estimator internals differ, results would not be bit-identical.
  *
  * HAVING and post-aggregation projections need no special handling:
  * they analyze ABOVE the `Aggregate`, the rewrite swaps the aggregate
  * under them, and the filter/projection applies unchanged.
  *
  * Shape: the matched `Aggregate` is replaced by an analyzed scan of
  * the bucketed state table plus the finish projection, wrapped in a
  * `Project` that re-aliases onto the ORIGINAL output exprIds — parent
  * operators are untouched. Discovery is a metadata probe (namespace
  * listing + config read + two version reads) that runs only when a
  * query IS an aggregate directly over a graft relation; disable with
  * `spark.graft.mview.rewrite=false`. Defensive by construction: any
  * failure inside the matcher leaves the plan untouched.
  *
  * Installed by [[GraftExtensions]] (`injectOptimizerRule` — runs in
  * the operator-optimization batch, before scan pushdown, so the
  * spliced state relation flows through the normal V2 pushdown).
  */
class GraftMviewRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.mview.rewrite", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate =>
        try rewrite(agg).getOrElse(agg)
        catch { case _: Throwable => agg }
    }

  private val Integral = Set[org.apache.spark.sql.types.DataType](
    ByteType, ShortType, IntegerType, LongType)

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    // the aggregate's child must be a BARE graft relation (column
    // pruning may have inserted a pass-through Project); any Filter in
    // between means a WHERE — no match
    val rel = agg.child match {
      case r: DataSourceV2Relation => r
      case Project(pl, r: DataSourceV2Relation)
          if pl.forall(_.isInstanceOf[AttributeReference]) => r
      case _ => return None
    }
    val gc = rel.catalog match {
      case Some(c: GraftCatalog) => c
      case _ => return None
    }
    val ident = rel.identifier.getOrElse(return None)
    val baseRef = (ident.namespace.toSeq :+ ident.name).mkString(".")
    // group keys: bare base columns only
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference => a.name
      case _ => return None
    }
    if (groupNames.isEmpty) return None
    val candidates = GraftMaterializedViews.registered(gc, baseRef)
    if (candidates.isEmpty) return None
    // freshness inputs: the scan's pinned version must BE the base's
    // current version (a VERSION AS OF read must never see newer state)
    val (baseTable, pinned) = rel.table match {
      case t: org.apache.spark.sql.graft.GraftSqlTable =>
        (t.gt, t.pinnedVersion)
      case _ => return None
    }
    if (pinned != baseTable.currentVersion) return None
    candidates.iterator.flatMap { case (viewRef, cfg) =>
      matchOne(agg, groupNames, gc, viewRef, cfg, pinned)
    }.take(1).toSeq.headOption
  }

  private def matchOne(agg: Aggregate, groupNames: Seq[String],
                       gc: GraftCatalog, viewRef: String,
                       cfg: GraftMaterializedViews.Config,
                       baseVersion: Long): Option[LogicalPlan] = {
    // plain single-table shape only; keys exactly the group columns
    if (cfg.filter.nonEmpty || cfg.dims.nonEmpty || cfg.derived.nonEmpty)
      return None
    if (cfg.keys.toSet != groupNames.toSet) return None
    def unfiltered(func: String, col: String): Option[String] =
      cfg.measures.find(m =>
        m.func == func && m.col == col && m.pred.isEmpty).map(_.name)
    // each output expression → the state-side SQL computing it exactly
    def stateSql(ne: NamedExpression): Option[String] = ne match {
      case a: AttributeReference if groupNames.contains(a.name) =>
        Some(s"`${a.name}`")
      case Alias(a: AttributeReference, _) if groupNames.contains(a.name) =>
        Some(s"`${a.name}`")
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        def dt = al.dataType.sql
        def intCol(e: Expression): Option[String] = e match {
          case a: AttributeReference if Integral.contains(a.dataType) =>
            Some(a.name)
          case _ => None
        }
        ae.aggregateFunction match {
          case Sum(e, _) => for {
            c <- intCol(e); m <- unfiltered("sum", c)
          } yield s"CASE WHEN _nn_$m = 0 THEN CAST(NULL AS $dt) " +
            s"ELSE CAST(_sum_$m AS $dt) END"
          case Average(e, _) => for {
            c <- intCol(e); m <- unfiltered("sum", c)
          } yield s"CASE WHEN _nn_$m = 0 THEN CAST(NULL AS $dt) " +
            s"ELSE CAST(CAST(_sum_$m AS DOUBLE) / _nn_$m AS $dt) END"
          case Min(e) => for {
            c <- intCol(e); m <- unfiltered("min", c)
          } yield s"CAST(_min_$m AS $dt)"
          case Max(e) => for {
            c <- intCol(e); m <- unfiltered("max", c)
          } yield s"CAST(_max_$m AS $dt)"
          case Count(Seq(Literal(1, IntegerType))) => Some("_cnt")
          case Count(Seq(e)) if !e.isInstanceOf[Literal] =>
            e match {
              case a: AttributeReference =>
                unfiltered("sum", a.name).map(m => s"_nn_$m")
                  .orElse(unfiltered("cnt", a.name).map(m => s"_cn_$m"))
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }
    val items = agg.aggregateExpressions.map(ne => stateSql(ne) match {
      case Some(s) => s
      case None => return None
    })
    // every structural condition holds — NOW pay the freshness reads
    if (GraftMaterializedViews.stateAnchor(gc, viewRef) != baseVersion)
      return None
    val stFq = (gc.name() +:
      GraftMaterializedViews.stateTableParts(viewRef))
      .map(p => s"`${p.replace("`", "``")}`").mkString(".")
    val sel = items.zipWithIndex
      .map { case (s, i) => s"$s AS `__mv_c$i`" }.mkString(", ")
    val finish = EliminateSubqueryAliases(
      spark.sql(s"SELECT $sel FROM $stFq").queryExecution.analyzed)
    if (finish.output.length != agg.aggregateExpressions.length)
      return None
    // re-alias onto the ORIGINAL output attributes (names + exprIds),
    // so parent operators — HAVING filters, projections, sorts — are
    // untouched
    val out = agg.aggregateExpressions.zip(finish.output).map {
      case (orig, na) =>
        Alias(na, orig.name)(exprId = orig.exprId)
    }
    Some(Project(out, finish))
  }
}
