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
  *   - the mview is single-table (no dims, no derived keys); a WHERE
  *     below the aggregate matches ONLY when it renders identically to
  *     the view's stored row filter, or references GROUP KEYS only
  *     (key predicates select whole groups, so they commute through
  *     the aggregation and apply to the state read instead);
  *   - group keys are exactly the view's keys (as a set);
  *   - every aggregate maps onto exact state: sum/avg/min/max over the
  *     INTEGRAL column of a registered measure (per-aggregate
  *     `FILTER (WHERE …)` matches a filtered measure by exact
  *     rendering), count(*), count(col). Approximate families (HLL
  *     dcount) never rewrite — estimator internals differ, results
  *     would not be bit-identical.
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
        // defensive: catalog debris / racing drops must degrade to the
        // untouched plan, never fail the user's query (fatal errors
        // still propagate)
        try rewrite(agg).getOrElse(agg)
        catch { case scala.util.control.NonFatal(_) => agg }
    }

  private val Integral = Set[org.apache.spark.sql.types.DataType](
    ByteType, ShortType, IntegerType, LongType)

  /** Mirror of createFromSql's predSql rendering: qualifiers stripped,
    * then `.sql` — a WHERE (or per-aggregate FILTER) matches a stored
    * view filter iff the two analyzed to the SAME rendering (exact,
    * conservative: superficially different but equivalent predicates
    * simply do not rewrite).
    */
  private def predSql(e: Expression): String =
    e.transform {
      case a: AttributeReference => a.withQualifier(Nil)
    }.sql

  /** The optimizer's InferFiltersFromConstraints adds `isnotnull(a)`
    * conjuncts the stored (analysis-time) filter rendering never had.
    * Strip exactly those: an IsNotNull(a) conjunct is dropped ONLY
    * when another top-level BinaryComparison conjunct (≠ null-safe
    * equality) references `a` — such a comparison evaluates null (row
    * filtered) whenever `a` is null, so the guard is implied and the
    * normalized predicate is EQUIVALENT, not merely similar.
    */
  private def strippedOfImpliedNotNull(e: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{And, BinaryComparison, EqualNullSafe, IsNotNull}
    def split(x: Expression): Seq[Expression] = x match {
      case And(l, r) => split(l) ++ split(r)
      case o => Seq(o)
    }
    val cs = split(e)
    val nullRejecting = cs.collect {
      case c: BinaryComparison if !c.isInstanceOf[EqualNullSafe] =>
        c.references.toSeq.map(_.exprId)
    }.flatten.toSet
    val kept = cs.filter {
      case IsNotNull(a: AttributeReference) =>
        !nullRejecting.contains(a.exprId)
      case _ => true
    }
    if (kept.isEmpty) e else kept.reduceLeft(And)
  }

  /** Rendering-stable form of a predicate: literal casts folded (the
    * stored analysis-time filter says `CAST(30 AS BIGINT)` where the
    * optimized query-side says `30L` — identical values), qualifiers
    * stripped. Both comparison sides run through this.
    */
  private def canonicalPredSql(e: Expression): String = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    val folded = e.transformUp {
      case c: Cast if c.child.isInstanceOf[Literal] && c.foldable =>
        scala.util.Try(Literal.create(c.eval(null), c.dataType))
          .getOrElse(c): Expression
    }
    predSql(folded)
  }

  /** The stored (analysis-time) rendering of a filter, canonicalized
    * through parse + literal-cast folding; None when unparseable.
    */
  private def canonicalStored(p: String): Option[String] =
    scala.util.Try(canonicalPredSql(
      spark.sessionState.sqlParser.parseExpression(p))).toOption

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    // the aggregate's child: a BARE graft relation, optionally under
    // pass-through/extraction Projects (column pruning; the analyzer's
    // `_groupingexpression` extraction for expression GROUP BYs —
    // their aliases INLINE back into the groups/outputs) and at most
    // ONE deterministic Filter (the WHERE — matched against the view's
    // stored filter, or commuted through the aggregation when it
    // touches plain group keys only)
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    var subst = Map.empty[org.apache.spark.sql.catalyst.expressions.ExprId,
      Expression]
    var queryFilter: Option[Expression] = None
    def peel(p: LogicalPlan): Option[DataSourceV2Relation] = p match {
      case r: DataSourceV2Relation => Some(r)
      case Project(pl, c) if pl.forall {
          case _: AttributeReference => true
          case al: Alias => al.child.deterministic
          case _ => false
        } =>
        subst ++= pl.collect { case al: Alias => al.exprId -> al.child }
        peel(c)
      case LFilter(cond, c) if queryFilter.isEmpty && cond.deterministic =>
        queryFilter = Some(cond); peel(c)
      case _ => None
    }
    val rel = peel(agg.child).getOrElse(return None)
    // inline extracted aliases transitively, so groups/outputs/filter
    // reference the relation's own attributes
    def inline(e: Expression): Expression = e.transformUp {
      case a: AttributeReference if subst.contains(a.exprId) =>
        inline(subst(a.exprId))
    }
    val groups = agg.groupingExpressions.map(inline)
    val outputs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case al @ Alias(child, name) =>
        Alias(inline(child), name)(exprId = al.exprId)
      case a: AttributeReference if subst.contains(a.exprId) =>
        Alias(inline(a), a.name)(exprId = a.exprId)
      case ne => ne
    }
    queryFilter = queryFilter.map(inline)
    if (groups.isEmpty || !groups.forall(_.deterministic)) return None
    val gc = rel.catalog match {
      case Some(c: GraftCatalog) => c
      case _ => return None
    }
    val ident = rel.identifier.getOrElse(return None)
    val baseRef = (ident.namespace.toSeq :+ ident.name).mkString(".")
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
      matchOne(groups, outputs, queryFilter, gc, viewRef, cfg, pinned)
    }.take(1).toSeq.headOption
  }

  private def matchOne(groups: Seq[Expression],
                       outputs: Seq[NamedExpression],
                       queryFilter: Option[Expression],
                       gc: GraftCatalog, viewRef: String,
                       cfg: GraftMaterializedViews.Config,
                       baseVersion: Long): Option[LogicalPlan] = {
    // single-table shape only (join mviews never rewrite: pushed
    // predicates perturb the query's join tree beyond exact matching)
    if (cfg.dims.nonEmpty) return None
    // group matching: a bare column is a plain key; any other
    // deterministic expression must render CANONICALLY EQUAL to a
    // DERIVED key's stored expression (`GROUP BY CAST(ts AS DATE)`
    // matches the daily-rollup mview's derived `day` key)
    val derivedByCanon: Map[String, String] = cfg.derived.flatMap {
      case (n, ex) => canonicalStored(ex).map(_ -> n)
    }.toMap
    val derivedNames = cfg.derived.map(_._1).toSet
    def keyOf(g: Expression): Option[String] = g match {
      case a: AttributeReference
          if cfg.keys.contains(a.name) && !derivedNames.contains(a.name) =>
        Some(a.name)
      case e => derivedByCanon.get(canonicalPredSql(e))
    }
    val groupKeys = groups.map(g =>
      keyOf(g).getOrElse(return None))
    if (cfg.keys.toSet != groupKeys.toSet) return None
    // plain (non-derived) key names — the only ones a residual WHERE
    // may reference (they are base columns AND state columns)
    val groupNames = groupKeys.filterNot(derivedNames)
    // the WHERE contract — identical results in every accepted case:
    //   - no WHERE, unfiltered view: trivially identical;
    //   - WHERE == the view's stored row filter (exact rendering
    //     match): the state aggregates exactly those rows;
    //   - WHERE over GROUP KEYS ONLY against an unfiltered view:
    //     key predicates select whole groups, so filtering the state's
    //     finish commutes with the aggregation.
    val residual: Option[String] = (cfg.filter, queryFilter) match {
      case (None, None) => None
      case (Some(f), Some(qc)) =>
        if (canonicalStored(f).contains(
            canonicalPredSql(strippedOfImpliedNotNull(qc)))) None
        else return None
      case (None, Some(qc)) =>
        if (qc.references.toSeq.forall(a => groupNames.contains(a.name)))
          Some(predSql(qc))
        else return None
      case (Some(_), None) => return None
    }
    def measureNamed(func: String, col: String,
                     pred: Option[String]): Option[String] =
      cfg.measures.find(m =>
        m.func == func && m.col == col &&
          m.pred.map(canonicalStored) == pred.map(Option(_))).map(_.name)
    // each output expression → the state-side SQL computing it exactly
    def stateSql(ne: NamedExpression): Option[String] = ne match {
      case a: AttributeReference if groupNames.contains(a.name) =>
        Some(s"`${a.name}`")
      case Alias(a: AttributeReference, _) if groupNames.contains(a.name) =>
        Some(s"`${a.name}`")
      // a DERIVED key's select-list expression: the state stores it as
      // a plain column under the derived name
      case Alias(e, _) if !e.isInstanceOf[AggregateExpression] &&
          groups.exists(_.semanticEquals(e)) =>
        keyOf(e).map(n => s"`$n`")
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.forall(_.deterministic) =>
        val aggPred = ae.filter.map(canonicalPredSql)
        def dt = al.dataType.sql
        def intCol(e: Expression): Option[String] = e match {
          case a: AttributeReference if Integral.contains(a.dataType) =>
            Some(a.name)
          case _ => None
        }
        ae.aggregateFunction match {
          case Sum(e, _) => for {
            c <- intCol(e); m <- measureNamed("sum", c, aggPred)
          } yield s"CASE WHEN _nn_$m = 0 THEN CAST(NULL AS $dt) " +
            s"ELSE CAST(_sum_$m AS $dt) END"
          case Average(e, _) => for {
            c <- intCol(e); m <- measureNamed("sum", c, aggPred)
          } yield s"CASE WHEN _nn_$m = 0 THEN CAST(NULL AS $dt) " +
            s"ELSE CAST(CAST(_sum_$m AS DOUBLE) / _nn_$m AS $dt) END"
          case Min(e) => for {
            c <- intCol(e); m <- measureNamed("min", c, aggPred)
          } yield s"CAST(_min_$m AS $dt)"
          case Max(e) => for {
            c <- intCol(e); m <- measureNamed("max", c, aggPred)
          } yield s"CAST(_max_$m AS $dt)"
          case Count(Seq(Literal(1, IntegerType))) if aggPred.isEmpty =>
            Some("_cnt")
          case Count(Seq(e)) if !e.isInstanceOf[Literal] =>
            e match {
              case a: AttributeReference =>
                measureNamed("sum", a.name, aggPred).map(m => s"_nn_$m")
                  .orElse(measureNamed("cnt", a.name, aggPred)
                    .map(m => s"_cn_$m"))
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }
    val items = outputs.map(ne => stateSql(ne) match {
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
    // a group-key-only residual WHERE applies to the STATE rows (same
    // key column names) — it selects whole groups, so it commutes
    val where = residual.map(r => s" WHERE $r").getOrElse("")
    val finish = EliminateSubqueryAliases(
      spark.sql(s"SELECT $sel FROM $stFq$where").queryExecution.analyzed)
    if (finish.output.length != outputs.length)
      return None
    // re-alias onto the ORIGINAL output attributes (names + exprIds),
    // so parent operators — HAVING filters, projections, sorts — are
    // untouched
    val out = outputs.zip(finish.output).map {
      case (orig, na) =>
        Alias(na, orig.name)(exprId = orig.exprId)
    }
    Some(Project(out, finish))
  }
}
