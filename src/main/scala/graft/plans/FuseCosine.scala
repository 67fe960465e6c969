package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the hand-written higher-order-function
  * cosine pattern —
  *
  *   aggregate(zip_with(a, b, (x,y) => x*y), 0.0, +) /
  *     (sqrt(aggregate(a, 0.0, Σx²)) * sqrt(aggregate(b, 0.0, Σx²)))
  *
  * (what a user writing cosine directly in the DataFrame API produces)
  * — into the fused codegen'd [[CosineSim]] expression with
  * `nanOnZero = true`, preserving raw-division semantics bit-for-bit
  * (same sequential accumulation order; 0/0 still NaN). Three
  * interpreted HOF chains per row collapse into one generated loop.
  *
  * The nullif-guarded form ([[graft.functions.VectorOps.cosine]]) is
  * not matched here: by the time user rules run, the optimizer has
  * hoisted the guard's common expression into a separate Project. The
  * library's own hot path already goes through CosineSim directly
  * (`VectorOps.cosine6`), so the rule exists for plans the library
  * didn't author.
  *
  * A non-matching tree is left untouched; the rule is a safe no-op
  * everywhere else. Registered via [[GraftExtensions]]
  * (injectOptimizerRule) or `experimental.extraOptimizations`.
  */
object FuseCosine extends Rule[LogicalPlan] {

  /** λ(x, y) → x * y over exactly the two lambda variables. */
  private def isPairProduct(lf: Expression): Boolean = lf match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(vx: NamedLambdaVariable, vy: NamedLambdaVariable), _) =>
      x.exprId == vx.exprId && y.exprId == vy.exprId
    case _ => false
  }

  /** λ(acc, v) → acc + v*v — the Σx² norm accumulator. */
  private def isSumSquares(lf: Expression): Boolean = lf match {
    case LambdaFunction(Add(acc: NamedLambdaVariable,
        Multiply(v1: NamedLambdaVariable, v2: NamedLambdaVariable, _), _),
        Seq(va: NamedLambdaVariable, vv: NamedLambdaVariable), _) =>
      acc.exprId == va.exprId && v1.exprId == vv.exprId && v2.exprId == vv.exprId
    case _ => false
  }

  private object DotProduct {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(ZipWith(a, b, lf), Literal(0.0, DoubleType), _, _)
          if isPairProduct(lf) => Some((a, b))
      case _ => None
    }
  }

  private object NormOf {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(ArrayAggregate(arg, Literal(0.0, DoubleType), lf, _))
          if isSumSquares(lf) => Some(arg)
      case _ => None
    }
  }

  /** The replacement must carry the replaced Divide's zero-denominator
    * behavior: ANSI error, TRY null, legacy NaN. */
  private def zeroModeOf(mode: EvalMode.Value): String = mode match {
    case EvalMode.ANSI => CosineSim.ZeroAnsi
    case EvalMode.TRY => CosineSim.ZeroNull
    case _ => CosineSim.ZeroNan
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotProduct(a, b), Multiply(NormOf(x), NormOf(y), _), evalCtx)
          if x.semanticEquals(a) && y.semanticEquals(b) =>
        CosineSim(a, b, zeroModeOf(evalCtx.evalMode))
    }
}
