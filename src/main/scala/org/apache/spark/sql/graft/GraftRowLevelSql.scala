package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, V2CommandExec}
import org.apache.spark.sql.functions.{coalesce, lit, when}

import graft.operators.GraftTable

/** SQL `MERGE INTO` and `UPDATE` for graft tables — the reference's
  * core write semantic (keyed upsert-merge,
  * `storage/azurestoragewrapper.py:237-258`) as ONE SQL statement.
  *
  * Spark 4 resolves `MergeIntoTable` / `UpdateTable` fully (assignments
  * typed and cast, attributes bound) and only rejects them at PHYSICAL
  * planning when the table lacks `SupportsRowLevelOperations`
  * (`SparkStrategies.scala:1099-1102`). [[GraftRowLevelSqlStrategy]]
  * plans them first, translating the resolved command onto
  * [[GraftTable.merge]]'s clause ladder / [[GraftTable.updateWhere]] —
  * so the SQL statement gets EXACTLY the Scala API's semantics and
  * physical shape: only partitions holding a claimed row rewrite,
  * untouched partitions keep their files byte-for-byte, one atomic
  * OCC commit.
  *
  * Restrictions (each rejected loudly, never silently degraded):
  *   - ON must CONTAIN a conjunction of `target-key = source-expression`
  *     equalities covering exactly the table's keys — the keyed-merge
  *     contract. ADDITIONAL (non-key) conjuncts form a RESIDUAL with
  *     full ANSI classification (round 11; [[GraftTable.merge]]'s
  *     `onResidual`): MATCHED = key equality AND residual, so a
  *     key-matched pair failing the residual is NOT matched — its
  *     target row is a WHEN NOT MATCHED BY SOURCE candidate and its
  *     source row a WHEN NOT MATCHED insert candidate, exactly
  *     Spark/Delta's MERGE semantics. (Consequence, same as Delta: a
  *     residual plus an unconditional INSERT can insert a source row
  *     next to its residual-failing target row — duplicate keys by the
  *     user's explicit choice.)
  *   - No subqueries inside clause conditions or assignments.
  *   - Nested-field assignments (`SET s.a.b = …`) are not supported.
  */
object GraftRowLevelSql {

  /** Strip alias wrappers — and pure attribute-permutation Projects —
    * down to the relation. The optimizer normalizes a schema-evolved
    * merge target to `Project [declared order] over RelationV2 [read
    * order]`; the projection renames nothing (same exprIds), so the
    * relation underneath is still the mutation target.
    */
  @scala.annotation.tailrec
  private def stripAlias(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => stripAlias(child)
    case Project(exprs, child)
        if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      stripAlias(child)
    case other => other
  }

  /** The graft DSv2 table under `p`, if that is what `p` is. */
  private[graft] def graftTarget(p: LogicalPlan): Option[GraftSqlTable] =
    stripAlias(p) match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftSqlTable => Some(t)
        case _ => None
      }
      case s: DataSourceV2ScanRelation => s.relation.table match {
        case t: GraftSqlTable => Some(t)
        case _ => None
      }
      case _ => None
    }

  /** Is the mutation target a bare relation once aliases strip — i.e.
    * NO reordering Project in between (the shape the built-in
    * capability execs require)?
    */
  private[graft] def bareRelationTarget(p: LogicalPlan): Boolean = {
    @scala.annotation.tailrec
    def strip(q: LogicalPlan): LogicalPlan = q match {
      case SubqueryAlias(_, child) => strip(child)
      case other => other
    }
    strip(p) match {
      case _: DataSourceV2Relation | _: DataSourceV2ScanRelation => true
      case _ => false
    }
  }

  private def targetOutput(p: LogicalPlan): Seq[Attribute] =
    stripAlias(p) match {
      case r: DataSourceV2Relation => r.output
      case s: DataSourceV2ScanRelation => s.output
      case other => other.output
    }

  private def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(s"graft SQL row-level op: $msg")

  private def checkNoSubquery(e: Expression, where: String): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      fail(s"subqueries are not supported in $where")

  /** Split a DELETE/UPDATE condition into (plain residual Column over
    * bare target names, subquery MEMBERSHIP constraints): each conjunct
    * of the form `<target column> [NOT] IN (<single-column subquery>)`
    * or `[NOT] EXISTS (<subquery>)` — correlated or not — materializes
    * its subquery plan as a DataFrame and becomes a
    * [[GraftTable.Membership]] routed to [[GraftTable.deleteWhereIn]] /
    * [[GraftTable.updateWhereIn]]'s distributed hash semi/anti joins,
    * with exact SQL null semantics (NOT IN is the null-aware
    * three-valued form). Correlation predicates arrive PULLED UP: the
    * optimizer's PullupCorrelatedPredicates fills the subquery's
    * `joinCond` with the correlated predicates and extends the plan's
    * projection with the columns they need — accepted here as a
    * conjunction of `<target column> = <subquery column>` equalities
    * (any other correlation shape fails loudly). Scalar subqueries
    * fail loudly rather than degrading.
    */
  private def splitSubqueryCondition(spark: ClassicSession, cond: Expression,
      tgtN: Map[ExprId, String], where: String)
      : (Column, Seq[GraftTable.Membership]) = {
    val none = Map.empty[ExprId, String]
    val (subs, plain) = graft.operators.PredicatePruning
      .splitConjuncts(cond).partition(
      _.exists(_.isInstanceOf[SubqueryExpression]))

    def checkPulled(outerAttrs: Seq[Expression], joinCond: Seq[Expression]): Unit =
      if (outerAttrs.nonEmpty && joinCond.isEmpty)
        fail(s"a correlated subquery in $where has an unsupported " +
          "correlation shape (its predicates could not be pulled up)")
    def pairsOf(joinCond: Seq[Expression], planOut: Seq[Attribute])
        : Seq[(String, Int)] = {
      val outIdx = planOut.map(_.exprId).zipWithIndex.toMap
      joinCond.map {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if tgtN.contains(a.exprId) && outIdx.contains(b.exprId) =>
          tgtN(a.exprId) -> outIdx(b.exprId)
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if tgtN.contains(b.exprId) && outIdx.contains(a.exprId) =>
          tgtN(b.exprId) -> outIdx(a.exprId)
        case other => fail(s"unsupported correlation predicate in $where: " +
          s"${other.sql} — only <target column> = <subquery column> " +
          "equalities are supported")
      }
    }
    def inPairs(a: AttributeReference, lq: ListQuery): Seq[(String, Int)] = {
      if (!tgtN.contains(a.exprId))
        fail(s"the IN probe in $where must be a bare target column")
      checkPulled(lq.outerAttrs, lq.joinCond)
      if (lq.numCols != 1)
        fail(s"the IN subquery in $where must select exactly one column")
      (tgtN(a.exprId) -> 0) +: pairsOf(lq.joinCond, lq.plan.output)
    }
    // materialize each subquery plan ONCE: the membership machinery
    // consumes a frame up to 4x (discovery filter, null-edge aggregate,
    // group + value-hit marker joins) — a LAZY local checkpoint caches
    // on first use without paying a job when discovery short-circuits
    def frame(p: LogicalPlan) =
      Dataset.ofRows(spark, p).toDF().localCheckpoint(false)
    // RewriteNonCorrelatedExists's shape, matched STRUCTURALLY (the
    // optimizer reshuffles the rewrite's Limit(1, Project(lit)) —
    // limit pushdown, project collapse): a LIMIT 1 somewhere, a
    // single CONSTANT output column, and NO aggregate. Anything else —
    // in particular a user-written `(SELECT max(v) FROM s) IS NULL`,
    // whose aggregate always returns one row so non-emptiness would be
    // the WRONG reading — is NOT a probe. (A user's literal
    // `(SELECT 1 FROM s LIMIT 1) IS NULL` matches, and non-emptiness
    // IS its exact semantics.)
    def isExistsProbe(sc: ScalarSubquery): Boolean =
      sc.outerAttrs.isEmpty && sc.plan.output.size == 1 && {
        val hasLimit1 = sc.plan.exists {
          case GlobalLimit(Literal(1, _), _) => true
          case LocalLimit(Literal(1, _), _) => true
          case _ => false
        }
        val constOutput = sc.plan.exists {
          case p: Project => p.projectList.size == 1 && p.projectList.forall {
            case Alias(_: Literal, _) => true
            case _: Literal => true
            case _ => false
          }
          case _ => false
        }
        val noAgg = !sc.plan.exists(_.isInstanceOf[Aggregate])
        hasLimit1 && constOutput && noAgg
      }
    // when the optimizer FULLY FOLDED the scalar subquery to a leaf
    // LocalRelation (local views: ConvertToLocalRelation collapses the
    // probe's Limit(1, Project(lit)) — and a user's constant-foldable
    // scalar too), the null test is EXACTLY evaluable driver-side:
    // <= 1 row materialized, `IS NULL` = no row or a null head value.
    // More than one row is the scalar subquery's runtime error — not
    // ours to swallow, falls through to the loud rejection.
    def localScalarIsNull(sc: ScalarSubquery): Option[Boolean] =
      sc.plan match {
        case lr: LocalRelation if sc.outerAttrs.isEmpty &&
            lr.output.size == 1 && lr.data.length <= 1 =>
          Some(lr.data.isEmpty || lr.data.head.isNullAt(0))
        case _ => None
      }
    val parts: Seq[Either[Column, GraftTable.Membership]] = subs.map {
      case InSubquery(Seq(a: AttributeReference), lq: ListQuery) =>
        scala.Right(GraftTable.Membership(inPairs(a, lq), frame(lq.plan)))
      case Not(InSubquery(Seq(a: AttributeReference), lq: ListQuery)) =>
        scala.Right(GraftTable.Membership(inPairs(a, lq), frame(lq.plan),
          negated = true, nullAware = true))
      case ex: Exists =>
        checkPulled(ex.outerAttrs, ex.joinCond)
        scala.Right(GraftTable.Membership(pairsOf(ex.joinCond, ex.plan.output),
          frame(ex.plan)))
      case Not(ex: Exists) =>
        checkPulled(ex.outerAttrs, ex.joinCond)
        scala.Right(GraftTable.Membership(pairsOf(ex.joinCond, ex.plan.output),
          frame(ex.plan), negated = true))
      // scalar null tests over a FULLY-FOLDED subquery (leaf
      // LocalRelation, <= 1 row — local views and constant-foldable
      // scalars): exactly evaluable right here, as a constant conjunct
      case IsNull(sc: ScalarSubquery) if localScalarIsNull(sc).isDefined =>
        scala.Left(lit(localScalarIsNull(sc).get))
      case IsNotNull(sc: ScalarSubquery) if localScalarIsNull(sc).isDefined =>
        scala.Left(lit(!localScalarIsNull(sc).get))
      case Not(IsNotNull(sc: ScalarSubquery))
          if localScalarIsNull(sc).isDefined =>
        scala.Left(lit(localScalarIsNull(sc).get))
      // the optimizer's RewriteNonCorrelatedExists turns an
      // UNCORRELATED [NOT] EXISTS into `scalarsubquery(limit 1) IS
      // [NOT] NULL` — a pure non-emptiness probe, matched by SHAPE so a
      // USER-written scalar null test like `(SELECT max(v) FROM s) IS
      // NULL` (aggregate ⇒ always one row ⇒ non-emptiness is the WRONG
      // reading) falls through to the loud rejection instead of
      // silently misreading
      case IsNotNull(sc: ScalarSubquery) if isExistsProbe(sc) =>
        scala.Right(GraftTable.Membership(Nil, frame(sc.plan)))
      case IsNull(sc: ScalarSubquery) if isExistsProbe(sc) =>
        scala.Right(GraftTable.Membership(Nil, frame(sc.plan), negated = true))
      case Not(IsNotNull(sc: ScalarSubquery)) if isExistsProbe(sc) =>
        scala.Right(GraftTable.Membership(Nil, frame(sc.plan), negated = true))
      case other => fail(s"unsupported subquery conjunct in $where: " +
        s"${other.sql} — supported: <target column> [NOT] IN " +
        "(<single-column subquery>) and [NOT] EXISTS (<subquery>), " +
        "correlated by <target column> = <subquery column> equalities")
    }
    val residual = (plain.map(remap(_, tgtN, none, where)) ++
      parts.collect { case scala.Left(c) => c })
      .reduceOption(_ && _).getOrElse(lit(true))
    (residual, parts.collect { case scala.Right(m) => m })
  }

  /** Remap attribute references to the name space of
    * [[GraftTable.merge]]'s joined frame: target columns by bare name,
    * source columns as `__s_<name>` (the [[GraftTable.src]] prefix).
    */
  private def remap(e: Expression, tgt: Map[ExprId, String],
                    src: Map[ExprId, String], where: String): Column = {
    checkNoSubquery(e, where)
    Bridge.toColumn(e.transform {
      case a: AttributeReference if tgt.contains(a.exprId) =>
        UnresolvedAttribute.quoted(tgt(a.exprId))
      case a: AttributeReference if src.contains(a.exprId) =>
        UnresolvedAttribute.quoted(s"__s_${src(a.exprId)}")
      case a: AttributeReference =>
        fail(s"$where references $a, which is neither the target nor the source")
    })
  }

  private def assignMap(assigns: Seq[Assignment], tgt: Map[ExprId, String],
                        src: Map[ExprId, String], where: String)
      : Map[String, Column] = {
    val pairs = assigns.map {
      case Assignment(k: AttributeReference, v) if tgt.contains(k.exprId) =>
        tgt(k.exprId) -> remap(v, tgt, src, where)
      case Assignment(k, _) =>
        fail(s"$where assigns to $k — only top-level target columns are assignable")
    }
    val dup = pairs.map(_._1).diff(pairs.map(_._1).distinct)
    if (dup.nonEmpty) fail(s"$where assigns ${dup.distinct.mkString(", ")} twice")
    pairs.toMap
  }

  /** ANSI multi-clause WHEN NOT MATCHED THEN INSERT → the single
    * (condition, assignments) form [[GraftTable.merge]] takes:
    * first-hit-wins per column, overall condition = OR of clauses.
    */
  private def composeInserts(clauses: Seq[(Column, Map[String, Column])])
      : (Column, Map[String, Column]) = clauses match {
    case Seq(one) => one
    case many =>
      val cond = many.map(c => coalesce(c._1, lit(false))).reduce(_ || _)
      val cols = many.flatMap(_._2.keys).distinct
      val set = cols.map { c =>
        c -> many.foldRight(lit(null)) { case ((ci, si), acc) =>
          when(coalesce(ci, lit(false)), si.getOrElse(c, lit(null))).otherwise(acc)
        }
      }.toMap
      (cond, set)
  }

  def runMerge(spark: ClassicSession, m: MergeIntoTable): Unit = {
    val st = graftTarget(m.targetTable).getOrElse(
      fail("MERGE target is not a graft table"))
    val gt = st.gt
    require(st.pinnedVersion == gt.currentVersion,
      s"MERGE INTO targets a time-travel snapshot (v${st.pinnedVersion}, " +
        s"head is v${gt.currentVersion}) — writes go to the live table only")
    val tgtN = targetOutput(m.targetTable).map(a => a.exprId -> a.name).toMap
    val srcOut = m.sourceTable.output
    val srcN = srcOut.map(a => a.exprId -> a.name).toMap
    if (srcOut.map(_.name).distinct.size != srcOut.size)
      fail(s"MERGE source has duplicate column names — alias them apart")

    // ON: key equalities (covering exactly the table keys) plus an
    // optional RESIDUAL of further conjuncts, folded into the matched
    // clauses below
    def srcOnly(e: Expression) = e.references.forall(a => srcN.contains(a.exprId))
    val keyPairsBuf = scala.collection.mutable.ArrayBuffer.empty[(String, Expression)]
    val residuals = scala.collection.mutable.ArrayBuffer.empty[Expression]
    // a key equated TWICE rejects rather than first-conjunct-wins:
    // `ON t.pk = 'a' AND t.pk = s.pk` would otherwise silently join on
    // the CONSTANT and demote the real key equality to a residual —
    // order-dependent and nothing like ANSI
    def claim(k: String, e: Expression): Unit = {
      if (keyPairsBuf.exists(_._1 == k))
        fail(s"ON equates key '$k' twice — fold one side into a clause " +
          "condition instead")
      keyPairsBuf += k -> e
    }
    graft.operators.PredicatePruning.splitConjuncts(m.mergeCondition).foreach {
      case EqualTo(a: AttributeReference, b)
          if tgtN.contains(a.exprId) && srcOnly(b) &&
            gt.keys.contains(tgtN(a.exprId)) =>
        claim(tgtN(a.exprId), b)
      case EqualTo(a, b: AttributeReference)
          if tgtN.contains(b.exprId) && srcOnly(a) &&
            gt.keys.contains(tgtN(b.exprId)) =>
        claim(tgtN(b.exprId), a)
      case other => residuals += other
    }
    val keyPairs: Seq[(String, Expression)] = keyPairsBuf.toSeq
    val onCols = keyPairs.map(_._1)
    if (onCols.toSet != gt.keys.toSet)
      fail(s"ON must contain <target key> = <source expression> equalities " +
        s"covering exactly the table keys ${gt.keys.mkString(", ")}; " +
        s"got ${if (onCols.isEmpty) "none" else onCols.mkString(", ")} " +
        s"(non-key conjuncts form the ANSI residual)")
    // the residual rides into the MATCH CONDITION itself
    // (GraftTable.merge onResidual) — ANSI classification, so every
    // clause family (matched / not-matched / by-source) sees exactly
    // the rows ANSI gives it; nothing folds, nothing is rejected
    val residualCol: Option[Column] = residuals.toSeq
      .map(remap(_, tgtN, srcN, "the ON residual")).reduceOption(_ && _)

    // the source frame [[GraftTable.merge]] receives: the source plan's
    // columns, plus each key materialized under its target name when the
    // ON maps it through an expression
    var srcDf = Dataset.ofRows(spark, m.sourceTable)
    keyPairs.foreach { case (k, e) =>
      val already = e match {
        case a: AttributeReference => srcN(a.exprId) == k
        case _ => false
      }
      if (!already) {
        if (srcDf.columns.contains(k))
          fail(s"ON maps key '$k' to ${e.sql}, but the source already has a " +
            s"column named '$k' — alias it apart")
        checkNoSubquery(e, "the ON condition")
        srcDf = srcDf.withColumn(k, Bridge.toColumn(e.transform {
          case a: AttributeReference => UnresolvedAttribute.quoted(srcN(a.exprId))
        }))
      }
    }

    def clauses(actions: Seq[MergeAction], where: String): Seq[GraftTable.MatchedClause] =
      actions.map {
        case UpdateAction(cond, assigns, _) => GraftTable.MatchedUpdate(
          cond.map(remap(_, tgtN, srcN, s"$where UPDATE condition")).getOrElse(lit(true)),
          assignMap(assigns, tgtN, srcN, s"$where UPDATE"))
        case DeleteAction(cond) => GraftTable.MatchedDelete(
          cond.map(remap(_, tgtN, srcN, s"$where DELETE condition")).getOrElse(lit(true)))
        case other => fail(s"unsupported $where action: $other")
      }
    val matched = clauses(m.matchedActions, "WHEN MATCHED")
    val nmbs = clauses(m.notMatchedBySourceActions, "WHEN NOT MATCHED BY SOURCE")
    val inserts = m.notMatchedActions.map {
      case InsertAction(cond, assigns) =>
        (cond.map(remap(_, tgtN, srcN, "WHEN NOT MATCHED condition")).getOrElse(lit(true)),
          assignMap(assigns, tgtN, srcN, "WHEN NOT MATCHED INSERT"))
      case other => fail(s"unsupported WHEN NOT MATCHED action: $other")
    }
    val insert = if (inserts.isEmpty) None else Some(composeInserts(inserts))

    gt.merge(srcDf, matched, insert,
      allowSchemaEvolution = m.withSchemaEvolution, notMatchedBySource = nmbs,
      onResidual = residualCol)
    ()
  }

  def runUpdate(spark: ClassicSession, u: UpdateTable): Unit = {
    val st = graftTarget(u.table).getOrElse(
      fail("UPDATE target is not a graft table"))
    val gt = st.gt
    require(st.pinnedVersion == gt.currentVersion,
      s"UPDATE targets a time-travel snapshot (v${st.pinnedVersion}, " +
        s"head is v${gt.currentVersion}) — writes go to the live table only")
    val tgtN = targetOutput(u.table).map(a => a.exprId -> a.name).toMap
    val none = Map.empty[ExprId, String]
    val (cond, inSets) = u.condition
      .map(splitSubqueryCondition(spark, _, tgtN, "the UPDATE WHERE clause"))
      .getOrElse((lit(true), Nil))
    gt.updateWhereIn(cond, assignMap(u.assignments, tgtN, none, "UPDATE SET"),
      inSets)
    ()
  }

  /** SQL `DELETE FROM` with SUBQUERY predicates — the shape the plain
    * `SupportsDeleteV2` path cannot translate to source filters
    * (`DELETE FROM t WHERE k IN (SELECT …)`). Claimed at physical
    * planning only when a subquery is present (subquery-free deletes
    * keep the existing capability path), decomposed by
    * [[splitSubqueryCondition]], and executed as
    * [[GraftTable.deleteWhereIn]] — the same O(matched-rows)
    * deletion-vector commit as any selective SQL DELETE, with the
    * subquery materialized once and semi-joined distributed.
    */
  /** True when the SupportsDeleteV2 capability path can take the
    * statement: every conjunct translates to the V2 filter language AND
    * [[GraftSqlTable.deleteWhere]]'s own translation accepts it.
    */
  private[graft] def deletableByCapability(cond: Expression): Boolean =
    graft.operators.PredicatePruning.splitConjuncts(cond).forall { c =>
      org.apache.spark.sql.execution.datasources.v2.DataSourceV2Strategy
        .translateFilterV2(c).exists(p =>
          GraftSqlRead.predicateColumn(p).isDefined)
    }

  def runDelete(spark: ClassicSession, d: DeleteFromTable): Unit = {
    val st = graftTarget(d.table).getOrElse(
      fail("DELETE target is not a graft table"))
    val gt = st.gt
    require(st.pinnedVersion == gt.currentVersion,
      s"DELETE targets a time-travel snapshot (v${st.pinnedVersion}, " +
        s"head is v${gt.currentVersion}) — writes go to the live table only")
    val tgtN = targetOutput(d.table).map(a => a.exprId -> a.name).toMap
    val (cond, inSets) =
      splitSubqueryCondition(spark, d.condition, tgtN, "the DELETE WHERE clause")
    gt.deleteWhereIn(cond, inSets)
    ()
  }
}

/** Physical command node: runs the translated merge/update on the
  * driver (the mutation itself is distributed Spark jobs inside
  * [[GraftTable]]); returns no rows.
  */
case class GraftRowLevelExec(@transient cmd: LogicalPlan)
    extends V2CommandExec with org.apache.spark.sql.execution.LeafExecNode {
  override def output: Seq[Attribute] = Nil
  override def run(): Seq[InternalRow] = {
    cmd match {
      case m: MergeIntoTable => GraftRowLevelSql.runMerge(session, m)
      case u: UpdateTable => GraftRowLevelSql.runUpdate(session, u)
      case d: DeleteFromTable => GraftRowLevelSql.runDelete(session, d)
      case other => throw new IllegalStateException(s"not a row-level command: $other")
    }
    Nil
  }
  override def simpleString(maxFields: Int): String =
    s"GraftRowLevelExec ${cmd.nodeName}"
}

/** Planner strategy: claim MERGE INTO / UPDATE over graft tables before
  * `BasicOperators` rejects them. Installed by `GraftSession.tune`
  * (live sessions) and `graft.ext.GraftExtensions` (build-time) —
  * experimental strategies run ahead of the built-ins.
  */
object GraftRowLevelSqlStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case m: MergeIntoTable if GraftRowLevelSql.graftTarget(m.targetTable).isDefined =>
      GraftRowLevelExec(m) :: Nil
    case u: UpdateTable if GraftRowLevelSql.graftTarget(u.table).isDefined =>
      GraftRowLevelExec(u) :: Nil
    // fully-translatable predicates keep the SupportsDeleteV2
    // capability path (incl. its metadata-only TRUNCATE/partition-drop
    // tiers); the strategy claims what that path would REJECT —
    // subqueries, and predicates the V2 filter language cannot express
    // (`c % 3 = 0`, function calls, …), which run as the same
    // deletion-vector commit through GraftTable.deleteWhereIn
    case d: DeleteFromTable
        if GraftRowLevelSql.graftTarget(d.table).isDefined &&
          (d.condition.exists(_.isInstanceOf[SubqueryExpression]) ||
            !GraftRowLevelSql.deletableByCapability(d.condition) ||
            !GraftRowLevelSql.bareRelationTarget(d.table)) =>
      // the third arm: a SCHEMA-EVOLVED table's relation arrives under
      // a reordering Project (evolved columns report after the
      // partition column) — the SupportsDeleteV2 capability exec
      // requires a bare relation and would internal-error, so the
      // strategy claims the statement and runs the same deletion-vector
      // commit through GraftTable.deleteWhereIn
      GraftRowLevelExec(d) :: Nil
    case _ => Nil
  }
}
