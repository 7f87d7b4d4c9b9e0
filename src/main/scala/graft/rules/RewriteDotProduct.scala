package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType}

import graft.functions.DotProduct

/** Optimizer rule: recognize the declarative dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0, (acc, v) -> acc + v)
  *
  * and replace it with the native codegen'd [[graft.functions.DotProduct]]
  * kernel. The two are bit-identical on every input (same widening, same
  * left-fold order, and the same null semantics: null result on null array,
  * length mismatch, or null element — asserted in SimilaritySpec), so this
  * is a pure performance rewrite: users keep writing portable `functions._`
  * code and the engine upgrades the hot loop. Injected via
  * [[graft.GraftExtensions]].
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case agg @ ArrayAggregate(
          ZipWith(a, b, LambdaFunction(mul: Multiply, Seq(x: NamedLambdaVariable,
            y: NamedLambdaVariable), _)),
          zero, LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable,
            v: NamedLambdaVariable), _), finish)
          if isZeroDouble(zero) && isIdentityFinish(finish) &&
            isWidenedPair(mul, x, y) && isAccPlusV(add, acc, v) &&
            isFloatArray(a) && isFloatArray(b) =>
        DotProduct(a, b)
      case other => other
    }

  private def isZeroDouble(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** aggregate's finish lambda defaults to identity. */
  private def isIdentityFinish(e: Expression): Boolean = e match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  private def stripCastToDouble(e: Expression): Option[Expression] = e match {
    case Cast(c, DoubleType, _, _) => Some(c)
    case _ => None
  }

  private def isWidenedPair(mul: Multiply, x: NamedLambdaVariable,
                            y: NamedLambdaVariable): Boolean = {
    (stripCastToDouble(mul.left), stripCastToDouble(mul.right)) match {
      case (Some(l: NamedLambdaVariable), Some(r: NamedLambdaVariable)) =>
        l.exprId == x.exprId && r.exprId == y.exprId
      case _ => false
    }
  }

  private def isAccPlusV(add: Add, acc: NamedLambdaVariable,
                         v: NamedLambdaVariable): Boolean =
    (add.left, add.right) match {
      case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
        l.exprId == acc.exprId && r.exprId == v.exprId
      case _ => false
    }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(FloatType, _) => true
    case _ => false
  }
}
