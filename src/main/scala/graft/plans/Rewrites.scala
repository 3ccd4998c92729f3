package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Optimizer rule: rewrite the idiomatic higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  *
  * into the native codegen'd [[graft.functions.DotProduct]]. The HOF
  * chain is interpreted (every higher-order function is
  * CodegenFallback) and materializes the zipped product array per row;
  * the kernel is a primitive-double loop inside whole-stage codegen.
  * Users keep writing the portable ANSI spelling and silently get the
  * engine kernel — the same contract Catalyst applies when it
  * constant-folds or pushes filters: semantics first, representation
  * second.
  *
  * Semantic equivalence is EXACT, case by case (mirrors DotProduct's
  * Scaladoc contract):
  *  - equal lengths, no null elements: identical left-to-right IEEE
  *    fold, bit-for-bit;
  *  - ragged lengths: `zip_with` pads with null, the null poisons the
  *    multiply then the whole fold -> null; DotProduct returns null;
  *  - a null ELEMENT on either side: same poisoning -> null on both;
  *  - both empty: the fold returns the zero literal `0.0` and the
  *    kernel's empty loop returns `0.0`;
  *  - null ARRAY input: null on both.
  * The zero literal must be EXACTLY bit-pattern +0.0: a `-0.0` zero
  * can surface as `-0.0` from the fold on empty arrays, which the
  * kernel would turn into `+0.0` — so that spelling is left alone.
  *
  * Scope guards: the lambda bodies must be exactly `x * y` / `acc + v`
  * over the lambda's OWN variables in declaration order (double
  * multiplication and addition are not commutative in general IEEE
  * code paths only up to NaN payloads — order is preserved, not
  * assumed), and both arrays must be `array<double>`. Anything else —
  * reversed operands, extra terms, casts inside the lambda — is not
  * rewritten.
  *
  * Registered by [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) for build-time sessions and usable via
  * `spark.experimental.extraOptimizations` on an existing session.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isPlusZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  /** body is exactly `first op second` over the lambda's own two
    * variables, in declaration order. */
  private def isVarPair(l: Expression, r: Expression,
                        args: Seq[NamedExpression]): Boolean =
    args match {
      case Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable) =>
        (l, r) match {
          case (v1: NamedLambdaVariable, v2: NamedLambdaVariable) =>
            v1.exprId == a1.exprId && v2.exprId == a2.exprId
          case _ => false
        }
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(m: Multiply, mArgs, false)),
            zero,
            LambdaFunction(s: Add, sArgs, false),
            LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), false))
          if isPlusZero(zero) &&
             isVarPair(m.left, m.right, mArgs) &&
             isVarPair(s.left, s.right, sArgs) &&
             fin.exprId == finArg.exprId &&
             isDoubleArray(a) && isDoubleArray(b) =>
        DotProduct(a, b)
    }
}
