package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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
  * identically — including the null case: `zip_with` pads a ragged
  * pair with nulls, which nulls the whole fold, so a length mismatch
  * returns null here too, and so does a NULL element (the HOF's
  * null-poisoned sum) — a sparse or ragged embedding must never yield
  * a plausible-looking partial similarity, including through the
  * SQL-registered `dot_product` where arbitrary callers reach it.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // nullable even over non-null inputs: ragged lengths produce null
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires (array<double>, array<double>), got " +
      s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd intersection SIZE of two SORTED distinct
  * `array<long>` columns — the verification kernel of the prefix-filter
  * similarity join (Dedup.prefixFilter): a two-pointer merge over the
  * pre-sorted shingle-hash arrays, no per-row hash-set build, no
  * intermediate array materialization (`array_intersect` + `size`
  * allocates the intersection and hashes every element; this runs in
  * whole-stage codegen as a primitive-long loop).
  *
  * CALLER CONTRACT: both arrays sorted ascending with distinct
  * elements. On unsorted input the count is silently wrong — that is
  * the one inherently uncheckable precondition (verifying sortedness
  * would cost the scan this kernel avoids); this is a kernel for
  * engine-internal plans, registered for SQL parity but not a
  * general-purpose set function. Null ARRAY inputs return null, and —
  * unlike sortedness — null ELEMENTS are cheap to detect along the
  * merge walk, so they null-poison the result (the [[DotProduct]]
  * contract; its scaladoc cites the SQL-registered reachability as
  * exactly why): a SQL caller passing `[1, NULL, 5]` gets NULL, never
  * a plausible wrong count read off a raw null slot. (A null sitting
  * past the point where the walk exhausts the other array is not
  * visited — detecting it would cost the full scan the kernel
  * avoids; the walk never reads such a slot, so no wrong value can
  * come from it.) */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  // nullable even over non-null inputs: a null ELEMENT poisons the count
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires (array<bigint>, array<bigint>), got " +
      s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      // ArrayData.getLong on a null slot reads the raw slot (usually
      // 0) — guard, or a SQL caller gets a plausible wrong count
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val u = x.getLong(i); val v = y.getLong(j)
      if (u < v) i += 1
      else if (u > v) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  final long $u = $a.getLong($i);
         |  final long $v = $b.getLong($j);
         |  if ($u < $v) { $i++; }
         |  else if ($u > $v) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $c; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd k-means cell assignment over a unit-vector
  * `array<double>` column: argmax over k centroids of
  * `floor(dot(u, cent_c) / norm_c * 1e6 + 0.5)` with ties broken
  * toward the SMALLEST cell id — bit-for-bit the semantics of
  * `Similarity.semCells`' packed-long `greatest()` spelling
  * ((ppm + 2e6)·2^20 + (2^20-1-cell): max pack ⇔ max ppm then min
  * cell), with the dot folded left-to-right in IEEE order like
  * [[DotProduct]] and the division-by-norm applied before the ppm
  * floor (`norm = 1.0` for unit seed centroids — /1.0 is an exact
  * identity).
  *
  * Why an Expression and not `greatest(k literal packs)`: at k = 79
  * (sf0.1's corpus-scaled cell count) the literal spelling builds 79
  * nested expression trees of 64-double `typedLit`s — measured
  * ~1.2-1.5 s PER PASS of analysis + codegen for ~25 ms of actual
  * arithmetic. Here the centroid matrix rides along as one reference
  * object (k×dim flattened) and the compiled loop is the whole plan.
  * Rows with a null array, a null element, or a length mismatch
  * against the centroid dim return null (the [[DotProduct]]
  * null-poison contract). */
case class CellArgMax(child: Expression, cents: Array[Double],
                      norms: Array[Double], ids: Array[Long], dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(dim > 0 && cents.length == norms.length * dim &&
      ids.length == norms.length,
    s"CellArgMax: ${cents.length} centroid doubles / ${norms.length} norms / " +
      s"${ids.length} ids inconsistent with dim=$dim")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cell_argmax"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cell_argmax requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[ArrayData]
    CellArgMax.assign(u, cents, norms, ids, dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
    nullSafeCodeGen(ctx, ev, u => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.CellArgMax.assign(
         |  $u, $centsRef, $normsRef, $idsRef, $dim);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $boxed).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CellArgMax =
    copy(child = newChild)
}

object CellArgMax {
  /** Shared by interpreted eval and generated code — one tight loop,
    * no per-row allocation. Returns java.lang.Long or null.
    *
    * Named `assign` (not `eval`) deliberately: the case class inherits
    * `eval(InternalRow)` from Expression, and Scala suppresses the
    * companion's static forwarder when the class has a member of the
    * same name — generated Java calling `CellArgMax.eval(...)` then
    * resolves to the instance methods and fails Janino compilation,
    * silently dropping the whole stage out of codegen. */
  def assign(u: ArrayData, cents: Array[Double], norms: Array[Double],
             ids: Array[Long], dim: Int): java.lang.Long = {
    if (u.numElements() != dim) return null
    // one null-scan + local copy, then the k x dim loop runs on a
    // primitive array (no per-element null checks inside the hot loop)
    val arr = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (u.isNullAt(j)) return null
      arr(j) = u.getDouble(j)
      j += 1
    }
    var bestP = Long.MinValue
    var bestCell = -1
    var c = 0
    val k = norms.length
    while (c < k) {
      var acc = 0.0
      var i = 0
      val base = c * dim
      while (i < dim) { acc += arr(i) * cents(base + i); i += 1 }
      val p = math.floor(acc / norms(c) * 1000000.0 + 0.5).toLong
      if (p > bestP) { bestP = p; bestCell = c }
      c += 1
    }
    // entries arrive sorted by cell id, so first-wins strict `>`
    // reproduces the packed-long smallest-cell tie-break; ids maps the
    // dense index back to the ORIGINAL cell id (degenerate cells are
    // filtered out upstream, leaving gaps)
    java.lang.Long.valueOf(ids(bestCell))
  }
}

object VectorFunctions {

  /** Column-level sorted-intersection count (codegen'd; see
    * [[SortedIntersectCount]] for the sortedness caller contract). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-level dot product (codegen'd). */
  def dotp(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-level k-means cell assignment (codegen'd; see
    * [[CellArgMax]] for the exact-ppm argmax semantics). `cents` is
    * the k×dim centroid matrix flattened row-major; `norms` the
    * per-centroid divisors (1.0 for unit centroids); `ids` maps the
    * dense index back to original cell ids. */
  def cellArgMax(u: Column, cents: Array[Double], norms: Array[Double],
                 ids: Array[Long], dim: Int): Column =
    ColumnBridge.column(
      CellArgMax(ColumnBridge.expression(u), cents, norms, ids, dim))

  /** Column-level L2 norm (codegen'd, same fold order as sum-of-squares). */
  def l2norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotp(a, a))

  private val info = new ExpressionInfo(classOf[DotProduct].getName, "dot_product")

  /** Arity-checked builder shared by both registration paths: a
    * mistyped `dot_product(a)` fails at analysis with usage, not with
    * an IndexOutOfBounds from children(1); input TYPES are validated
    * by DotProduct.checkInputDataTypes. */
  private[functions] def build(children: Seq[Expression]): Expression = {
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"dot_product requires exactly 2 arguments (array<double>, array<double>); got ${children.length}")
    DotProduct(children.head, children(1))
  }

  /** Idempotent SQL registration so `expr("dot_product(a, b)")` and
    * pure-SQL pipelines can call it; mirrors what
    * [[GraftExtensions]] injects at session build time. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_product"), info, build _)
}

/** The engine's native SQL function surface — one builder list shared
  * by the two registration paths, so they can never drift:
  *
  *  - `dot_product(array<double>, array<double>)` — codegen'd fold
  *  - `shingle_hash(array<string>, n[, distinct])` — 60-bit n-token
  *    window hashes (distinct/sorted by default; positional when
  *    distinct = false)
  *  - `wire_timestamp(string)` — the wire-format timestamp parse
  */
object GraftFunctions {

  // type-checked literal extraction: erasure would let a NULL or LONG
  // literal slip through a generic asInstanceOf (null unboxes to n=0 —
  // silently wrong shingles; a Long throws a bare ClassCastException)
  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _)
        if v.isValidInt => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def boolLit(e: Expression, what: String): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  val entries: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => VectorFunctions.build(children)),
    (FunctionIdentifier("shingle_hash"),
      new ExpressionInfo(classOf[ShingleHash].getName, "shingle_hash"),
      (children: Seq[Expression]) => children match {
        case Seq(toks, n) =>
          ShingleHash(toks, intLit(n, "shingle_hash n"))
        case Seq(toks, n, d) =>
          ShingleHash(toks, intLit(n, "shingle_hash n"),
            boolLit(d, "shingle_hash distinct"))
        case other => throw new IllegalArgumentException(
          s"shingle_hash requires (tokens, n[, distinct]); got ${other.length} args")
      }),
    (FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
                         "sorted_intersect_count"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => SortedIntersectCount(a, b)
        case other => throw new IllegalArgumentException(
          s"sorted_intersect_count requires exactly 2 arguments; got ${other.length}")
      }),
    (FunctionIdentifier("wire_timestamp"),
      new ExpressionInfo(classOf[WireTimestamp].getName, "wire_timestamp"),
      (children: Seq[Expression]) => children match {
        case Seq(s) => WireTimestamp(s)
        case other => throw new IllegalArgumentException(
          s"wire_timestamp requires exactly 1 argument; got ${other.length}")
      }))

  /** Idempotent registration into an EXISTING session (notebook /
    * test path; `withExtensions` only applies at session build). */
  def registerAll(spark: SparkSession): Unit =
    entries.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `SparkSessionExtensions` hook: sessions built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) get every
  * native graft function as a plain SQL function with no per-query
  * registration. Same builders as [[GraftFunctions.registerAll]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.entries.foreach(ext.injectFunction)
    // HOF dot-product pattern -> codegen'd DotProduct kernel
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
  }
}
