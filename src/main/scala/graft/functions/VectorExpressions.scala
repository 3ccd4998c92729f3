package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * The built-in route — `aggregate(zip_with(a, b, (x, y) -> x * y),
  * 0.0, (acc, v) -> acc + v)` — materializes an intermediate array and
  * evaluates the lambdas interpreted (higher-order functions are
  * CodegenFallback), which made the cosine rerank the hot path of every
  * similarity query. This expression compiles to a primitive `double`
  * loop inside whole-stage codegen: no allocation, no virtual calls.
  *
  * Semantics match the HOF formulation bit-for-bit on the engine's
  * embedding data: a sequential left-to-right fold of `a(i) * b(i)` in
  * IEEE-double order, so DuckDB `list_reduce` oracles keep hashing
  * identically. Inputs are assumed element-non-null (enforced upstream:
  * embeddings are dense vectors); length mismatch folds the common
  * prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be array<double> (the Column helpers below and
  // the analyzer's function resolution construct it that way; there is
  // no implicit cast — a mistyped SQL call fails in codegen, loudly).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Column-level dot product (codegen'd). */
  def dotp(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-level L2 norm (codegen'd, same fold order as sum-of-squares). */
  def l2norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotp(a, a))

  private val info = new ExpressionInfo(classOf[DotProduct].getName, "dot_product")

  /** Idempotent SQL registration so `expr("dot_product(a, b)")` and
    * pure-SQL pipelines can call it; mirrors what
    * [[GraftExtensions]] injects at session build time. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_product"), info,
      (children: Seq[Expression]) => DotProduct(children(0), children(1)))
}

/** `SparkSessionExtensions` hook: sessions built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) get the
  * native functions without any per-query registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
}
