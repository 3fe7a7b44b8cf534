package graft.ext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.expr.FixedDot

/** Catalyst optimizer rule: recognize the composable HOF fixed-point
  * dot product — `aggregate(zip_with(a, b, (x, y) ->
  * CAST(floor(x·y·10⁹) AS LONG)), 0L, (acc, el) -> acc + el)`, the
  * [[graft.functions.VectorFns.dotFixed9Hof]] formulation any USER of
  * the engine can write with public functions — and rewrite it to the
  * fused codegen'd [[FixedDot]] primitive loop (~4× on the similarity
  * operators: no intermediate array, no interpreted lambdas, stays
  * inside whole-stage codegen).
  *
  * The rewrite is sound because [[FixedDot]] matches the HOF
  * formulation on EVERY input — including null arrays, unequal lengths
  * (zip_with null padding) and null elements — which `FixedDotSpec`
  * asserts case by case. The match is deliberately strict (exact
  * literal scale, exact lambda shapes); anything else is left alone.
  *
  * Installed either at build time ([[GraftExtensions]], usable via
  * `spark.sql.extensions=graft.ext.GraftExtensions`) or on a LIVE
  * session through `spark.experimental.extraOptimizations` (what
  * [[graft.GraftSession.tune]] does — the driver harness hands us an
  * already-built session).
  */
object RewriteHofFixedDot extends Rule[LogicalPlan] {

  /** `CAST(FLOOR((x cast double) * (y cast double) * 1.0E9) AS LONG)`
    * over the two zip_with lambda variables, in either multiply
    * association.
    */
  private def isFixedMulLambda(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(body, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      def isVarCast(e: Expression, v: NamedLambdaVariable): Boolean = e match {
        case Cast(nv: NamedLambdaVariable, DoubleType, _, _) => nv.exprId == v.exprId
        case nv: NamedLambdaVariable => nv.exprId == v.exprId && nv.dataType == DoubleType
        case _ => false
      }
      // floor(double) is already LONG, so SimplifyCasts may have
      // dropped the redundant CAST by the time this rule runs — accept
      // both shapes
      val floored = body match {
        case Cast(fl @ Floor(_), LongType, _, _) => Some(fl)
        case fl @ Floor(_) => Some(fl)
        case _ => None
      }
      floored.exists { case Floor(mul) =>
        mul match {
          case Multiply(Multiply(ex, ey, _), Literal(1.0e9, DoubleType), _) =>
            isVarCast(ex, x) && isVarCast(ey, y)
          case Multiply(Literal(1.0e9, DoubleType), Multiply(ex, ey, _), _) =>
            isVarCast(ex, x) && isVarCast(ey, y)
          case _ => false
        }
      }
    case _ => false
  }

  /** `(acc, el) -> acc + el` on longs. */
  private def isSumLambda(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Add(a: NamedLambdaVariable, e: NamedLambdaVariable, _),
                        Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _) =>
      a.exprId == acc.exprId && e.exprId == el.exprId
    case _ => false
  }

  /** identity finish lambda `acc -> acc`. */
  private def isIdentityLambda(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(acc: NamedLambdaVariable), _) =>
      v.exprId == acc.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r, zf: LambdaFunction),
            Literal(0L, LongType),
            mf: LambdaFunction,
            ff: LambdaFunction)
          if isFixedMulLambda(zf) && isSumLambda(mf) && isIdentityLambda(ff) =>
        FixedDot(l, r)
    }
}

/** Build-time extension hook: `SparkSession.builder.withExtensions(new
  * GraftExtensions)` or `--conf spark.sql.extensions=graft.ext.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteHofFixedDot)
    // transparent materialized-view rewrite: an aggregate exactly
    // matching a registered FULLY-FRESH mview answers from its state
    // table (provably identical results; stale/partial → untouched).
    // Build-time only: the spliced state relation must flow through
    // the V2 pushdown batch, which has already run by the time live
    // extraOptimizations execute.
    ext.injectOptimizerRule(session => new GraftMviewRewrite(session))
    ext.injectPlannerStrategy(_ =>
      org.apache.spark.sql.graft.GraftRowLevelSqlStrategy)
    // persisted V2 views resolve in SELECTs (vanilla 4.1 ships the
    // ViewCatalog protocol with no SQL read wiring) — build-time only,
    // analyzer rules cannot be added to a live session
    ext.injectResolutionRule(session => new GraftResolveViews(session))
    // … and view DDL (CREATE/DROP VIEW, SHOW VIEWS) targeting a graft
    // catalog parses natively (vanilla hard-wires view DDL to the
    // session catalog); everything else delegates verbatim
    ext.injectParser((session, parser) => new GraftSqlParser(session, parser))
  }
}
