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

/** Native codegen'd PREFIX dot products: one left-to-right pass over
  * two `array<double>` columns emitting the running dot at each
  * requested prefix width — the matryoshka-truncation kernel
  * (q_matryoshka audits 4 widths per pair; spelled as 4 independent
  * [[DotProduct]]s over stored slices that costs 8+16+32+64 = 120
  * multiplies per pair and 3 sliced copies per stored vector, where
  * ONE 64-element pass with checkpoints costs 64 and slices nothing).
  *
  * The fold order at width w is identical to `DotProduct(slice(a, 1,
  * w), slice(b, 1, w))` — a prefix of the same left-to-right IEEE
  * sequence — so every emitted value is BIT-EQUAL to the slice
  * spelling it replaces (spec-pinned, VectorExpressionsSpec) and
  * DuckDB slice-based oracles keep hashing identically. Null contract
  * is [[DotProduct]]'s: ragged lengths, arrays shorter than the
  * deepest width, or a null element inside it null the WHOLE result —
  * never a plausible partial array. `widths` must be ascending
  * positive (constructor-checked); it is plan metadata, not a child
  * expression. Not SQL-registered: the oracle side deliberately keeps
  * the slice spelling, and an int-list SQL argument would need its own
  * builder for no caller. */
case class PrefixDots(left: Expression, right: Expression, widths: Seq[Int])
    extends BinaryExpression {

  require(widths.nonEmpty && widths.head > 0 &&
    widths.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    s"prefix_dots widths must be ascending positive, got $widths")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // nullable even over non-null inputs: ragged/short arrays produce null
  override def nullable: Boolean = true
  override def prettyName: String = "prefix_dots"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"prefix_dots requires (array<double>, array<double>), got " +
      s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val maxW = widths.last
    if (n != y.numElements() || n < maxW) return null
    val out = new Array[Double](widths.length)
    var acc = 0.0
    var i = 0
    var w = 0
    while (i < maxW) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
      if (i == widths(w)) { out(w) = acc; w += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val maxW = widths.last
      // unrolled constant-compare checkpoints: after element i the
      // completed prefix length is i + 1
      val checkpoints = widths.zipWithIndex.map { case (w, k) =>
        s"if ($i == ${w - 1}) $out[$k] = $acc;"
      }.mkString("\n    ")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements() || $n < $maxW) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $out = new double[${widths.length}];
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $maxW; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |    $checkpoints
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PrefixDots =
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
  // fail at construction, not as an opaque per-row AIOOBE (ids(-1))
  // mid-job: an empty centroid set passes the consistency check above
  // (0 == 0·dim) but argmax over zero cells is undefined (r14 review)
  require(ids.nonEmpty, "CellArgMax: empty centroid set — argmax over " +
    "zero cells is undefined (filter degenerate cells before the kernel)")

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

/** Native codegen'd top-n k-means cell selection — [[CellArgMax]]'s
  * sibling for the IVF probe side: the n cells (of k) whose centroids
  * have the LARGEST `floor(dot(u, cent_c) / norm_c * 1e6 + 0.5)`,
  * returned as an `array<bigint>` of ORIGINAL cell ids ordered by
  * (ppm desc, cell id asc) — bit-for-bit the packed-long spelling
  * `slice(reverse(array_sort(array(k packs))), 1, n)` decoded, the
  * ordering [[graft.queries.Similarity]]'s IVF probe list used to
  * build from k literal `typedLit` trees (~0.25-0.3 s of analysis +
  * Janino codegen per pass at k=16/dim=64 for microseconds of math —
  * the same planning-cost disease CellArgMax cured for the argmax
  * case at k=79). Same null-poison contract: null array, null
  * element, or a length mismatch against `dim` returns null. */
case class CellTopN(child: Expression, cents: Array[Double],
                    norms: Array[Double], ids: Array[Long], dim: Int, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(dim > 0 && cents.length == norms.length * dim &&
      ids.length == norms.length,
    s"CellTopN: ${cents.length} centroid doubles / ${norms.length} norms / " +
      s"${ids.length} ids inconsistent with dim=$dim")
  require(n > 0, s"CellTopN: n=$n must be positive")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cell_topn"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cell_topn requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[ArrayData]
    CellTopN.topn(u, cents, norms, ids, dim, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
    nullSafeCodeGen(ctx, ev, u => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.CellTopN.topn(
         |  $u, $centsRef, $normsRef, $idsRef, $dim, $n);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $boxed; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CellTopN =
    copy(child = newChild)
}

/** The ONE spelling of the (ppm desc, earlier-entry-first) m-slot
  * sorted-insertion step shared by [[CellTopN.topn]] and
  * [[CellTopNChunk.topn]]: CellChunkParitySpec pins those two paths
  * bit-equal, so the subtle selection logic (strict-> scan, shift,
  * equal-ppm-never-displaces) must not exist as two hand-kept copies
  * a future edit could de-synchronize (r14 review). Entries arrive in
  * ascending cell order on both paths, so "equal ppm never displaces"
  * reproduces the packed-long smaller-id tie-break. Returns the
  * updated filled count. */
private[functions] object TopNInsert {
  def insert(topP: Array[Long], topC: Array[Int], filled: Int, m: Int,
             p: Long, c: Int): Int = {
    // find insertion slot: first slot whose ppm is STRICTLY smaller
    var pos = filled
    var s = 0
    var found = false
    while (s < filled && !found) {
      if (p > topP(s)) { pos = s; found = true } else s += 1
    }
    if (pos < m) {
      val last = math.min(filled, m - 1)
      var t = last
      while (t > pos) { topP(t) = topP(t - 1); topC(t) = topC(t - 1); t -= 1 }
      topP(pos) = p
      topC(pos) = c
      if (filled < m) filled + 1 else filled
    } else filled
  }
}

object CellTopN {
  /** Shared by interpreted eval and generated code (named `topn`, not
    * `eval`, for the same static-forwarder reason as
    * [[CellArgMax.assign]]). Returns ArrayData of min(n, k) original
    * cell ids ordered by (ppm desc, id asc), or null on the poison
    * cases. Selection is insertion into an m-slot sorted buffer —
    * O(k·m) with m = nprobe (tiny); entries arrive sorted by cell id,
    * so "equal ppm never displaces" reproduces the packed-long
    * smaller-id-first tie-break. */
  def topn(u: ArrayData, cents: Array[Double], norms: Array[Double],
           ids: Array[Long], dim: Int, n: Int): ArrayData = {
    if (u.numElements() != dim) return null
    val arr = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (u.isNullAt(j)) return null
      arr(j) = u.getDouble(j)
      j += 1
    }
    val k = norms.length
    val m = math.min(n, k)
    val topP = new Array[Long](m)
    val topC = new Array[Int](m)
    var filled = 0
    var c = 0
    while (c < k) {
      var acc = 0.0
      var i = 0
      val base = c * dim
      while (i < dim) { acc += arr(i) * cents(base + i); i += 1 }
      val p = math.floor(acc / norms(c) * 1000000.0 + 0.5).toLong
      // same ±2e6 check as CellTopNChunk.topn (r14 ADVICE): this path
      // has no packed combine downstream, but the two kernels are
      // spec-pinned bit-equal and must not DIVERGE IN FAILURE BEHAVIOR
      // exactly where inputs are malformed — a non-normalized caller
      // fails loudly on both paths instead of only on the chunked one.
      // NaN dots still pass on both (floor(NaN).toLong = 0).
      if (p < -2000000L || p > 2000000L)
        throw new IllegalArgumentException(
          s"cell_topn: ppm=$p at index $c exceeds the ±2e6 bound — the " +
            "caller must unit-normalize vectors (CellTopNChunk parity: " +
            "both top-n paths refuse non-normalized input identically)")
      // (ascending c ⇒ equal-ppm keeps the earlier, smaller cell id)
      filled = TopNInsert.insert(topP, topC, filled, m, p, c)
      c += 1
    }
    val out = new Array[Long](filled)
    var o = 0
    while (o < filled) { out(o) = ids(topC(o)); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native codegen'd SRP sign-bit bucketing over an `array<double>`
  * vector column: for each of `nTables` hash tables, the bucket id is
  * `Σ_p (dot(v, plane[t][p]) >= 0 ? 2^p : 0)` over `nBits` md5-derived
  * hyperplanes, each dot a left-to-right IEEE fold ([[DotProduct]]
  * order — the DuckDB oracle's `list_reduce` spelling). With
  * `withProbes` the output doubles to `[bk_0..bk_{T-1},
  * fp_0..fp_{T-1}]` where `fp_t` flips the table's WEAKEST sign bit
  * (first argmin |dot|, `array_position` first-match ties) — the
  * multi-probe LSH probe sequence (Lv et al. 2007).
  *
  * Why an Expression: the literal spelling built one
  * `dotp(col, typedLit(dim doubles))` tree per (table, bit) — 40
  * trees for the 8×5 probe index, 32 for the 4×8 dedup blocker —
  * and paid ~15-20 ms of Catalyst analysis + Janino codegen PER TREE
  * PER PASS for microseconds of arithmetic (the [[CellArgMax]]
  * disease in SRP form). Here the whole plane tensor rides as ONE
  * reference object and the T×B×dim loop is the plan. Null array,
  * null element, or a length mismatch against `dim` returns null. */
case class SrpBuckets(child: Expression, planes: Array[Double],
                      nTables: Int, nBits: Int, dim: Int, withProbes: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(nTables > 0 && nBits > 0 && nBits <= 62 && dim > 0 &&
      planes.length == nTables * nBits * dim,
    s"SrpBuckets: ${planes.length} plane doubles inconsistent with " +
      s"$nTables tables x $nBits bits x dim=$dim")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "srp_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_buckets requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[ArrayData]
    SrpBuckets.buckets(u, planes, nTables, nBits, dim, withProbes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, u => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.SrpBuckets.buckets(
         |  $u, $planesRef, $nTables, $nBits, $dim, $withProbes);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $boxed; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}

object SrpBuckets {
  /** Shared by interpreted eval and generated code (named `buckets`,
    * not `eval` — the [[CellArgMax.assign]] static-forwarder lesson).
    * Returns ArrayData of nTables bucket longs (+ nTables flipped
    * probes when withProbes), or null on the poison cases.
    *
    * Bit-equality notes vs the retired literal spelling: the dot is
    * the same left-to-right fold; `>= 0` admits -0.0 on both sides
    * (Java primitive `-0.0 >= 0` is true, as is SQL's); the weakest
    * bit keeps the FIRST index attaining min |dot| (strict `<`
    * update), matching `array_position(.., array_min(..))`. */
  def buckets(u: ArrayData, planes: Array[Double], nTables: Int, nBits: Int,
              dim: Int, withProbes: Boolean): ArrayData = {
    if (u.numElements() != dim) return null
    val arr = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (u.isNullAt(j)) return null
      arr(j) = u.getDouble(j)
      j += 1
    }
    val out = new Array[Long](if (withProbes) 2 * nTables else nTables)
    var t = 0
    while (t < nTables) {
      var bk = 0L
      var minAbs = Double.PositiveInfinity
      var wk = 0
      var p = 0
      while (p < nBits) {
        var acc = 0.0
        var i = 0
        val base = (t * nBits + p) * dim
        while (i < dim) { acc += arr(i) * planes(base + i); i += 1 }
        if (acc >= 0) bk |= (1L << p)
        val a = math.abs(acc)
        if (a < minAbs) { minAbs = a; wk = p }
        p += 1
      }
      out(t) = bk
      if (withProbes) out(nTables + t) = bk ^ (1L << wk)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native codegen'd product-quantization kernel over a unit-vector
  * `array<double>` column, in two modes sharing one slice-dot loop:
  *
  *  - `lut = false` (encode): per subspace `s`, the packed argmin
  *    `min_j(floor((|u_s|² - 2·u_s·c_{s,j} + |c_{s,j}|²)·1e6 + 0.5)
  *    · k + j)` — squared-L2 ppm via the dot identity, ties toward
  *    the smallest code id via the pack. Output `array<bigint>` of m
  *    packs (pk div k = the subspace's d²ppm, pk mod k = the code).
  *  - `lut = true` (query ADC table): `floor(u_s · c_{s,j} · 1e6 +
  *    0.5)` for every (s, j), s-major — the per-query lookup table
  *    ADC prices candidates from.
  *
  * Exact-arithmetic contract (the DuckDB oracles hash-compare these
  * integers): every dot/|·|² is a left-to-right IEEE fold over the
  * slice; d² evaluates as `(usq - (2.0·dot)) + csq` with `csq`
  * folded driver-side in the same order; the ppm floor is
  * `floor((x·1e6) + 0.5)` — all bit-identical to the retired
  * per-(subspace, code) literal `dotp(us_s, typedLit(slice))` trees
  * (m·k = 64 trees of analysis + Janino codegen per pass, the
  * [[CellArgMax]] planning-cost disease in PQ form). Null array,
  * null element, or a length mismatch against m·sub returns null. */
case class PqKernel(child: Expression, codebook: Array[Double],
                    csq: Array[Double], m: Int, k: Int, sub: Int, lut: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(m > 0 && k > 0 && sub > 0 &&
      codebook.length == m * k * sub && csq.length == m * k,
    s"PqKernel: ${codebook.length} codebook doubles / ${csq.length} csq " +
      s"inconsistent with m=$m k=$k sub=$sub")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = if (lut) "pq_lut" else "pq_packs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[ArrayData]
    PqKernel.compute(u, codebook, csq, m, k, sub, lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "double[]")
    val csqRef = ctx.addReferenceObj("csq", csq, "double[]")
    nullSafeCodeGen(ctx, ev, u => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.PqKernel.compute(
         |  $u, $cbRef, $csqRef, $m, $k, $sub, $lut);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $boxed; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqKernel =
    copy(child = newChild)
}

object PqKernel {
  /** Shared by interpreted eval and generated code (named `compute`,
    * not `eval` — the [[CellArgMax.assign]] static-forwarder lesson).
    * Codebook is (subspace, code, component)-major; csq is the
    * per-(subspace, code) |c|² folded left-to-right driver-side. */
  def compute(u: ArrayData, codebook: Array[Double], csq: Array[Double],
              m: Int, k: Int, sub: Int, lut: Boolean): ArrayData = {
    val dim = m * sub
    if (u.numElements() != dim) return null
    val arr = new Array[Double](dim)
    var j0 = 0
    while (j0 < dim) {
      if (u.isNullAt(j0)) return null
      arr(j0) = u.getDouble(j0)
      j0 += 1
    }
    val out = new Array[Long](if (lut) m * k else m)
    var s = 0
    while (s < m) {
      val off = s * sub
      var usq = 0.0
      if (!lut) {
        var i = 0
        while (i < sub) { val x = arr(off + i); usq += x * x; i += 1 }
      }
      var best = Long.MaxValue
      var j = 0
      while (j < k) {
        var dot = 0.0
        var i = 0
        val base = (s * k + j) * sub
        while (i < sub) { dot += arr(off + i) * codebook(base + i); i += 1 }
        if (lut) {
          out(s * k + j) = math.floor(dot * 1000000.0 + 0.5).toLong
        } else {
          val d2 = usq - 2.0 * dot + csq(s * k + j)
          val pk = math.floor(d2 * 1000000.0 + 0.5).toLong * k + j
          if (pk < best) best = pk
        }
        j += 1
      }
      if (!lut) out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native codegen'd top-n cell selection over ONE CHUNK of a centroid
  * TABLE — the inverted-file-join escalation of [[CellArgMax]] /
  * [[CellTopN]] past their audited reference-object ceiling (4096
  * cells): instead of the whole k×dim matrix riding in every task as
  * one codegen constant, centroids become a RELATION of ≤chunk-size
  * row groups `(ccents, cnorms, cids)`, each vector row joins every
  * chunk row, this kernel emits the chunk-local top n as
  * `array<struct<ppm, cell>>`, and a bounded per-vector combine takes
  * the global (ppm desc, id asc) top n — exact, because cells
  * partition across chunks and argmax/top-n distribute over the
  * partition. Per-pair arithmetic is IDENTICAL to [[CellTopN.topn]]
  * (left-to-right IEEE dot, /norm before the `floor(x·1e6+0.5)` ppm,
  * ascending-index = smaller-id tie-break), so the joined path is
  * bit-equal to the kernel path wherever both are legal (spec-pinned).
  *
  * Null contract is split by WHO is wrong: an invalid vector (null
  * array, null element, ragged length) is row data and returns null
  * ([[DotProduct]] poison); a malformed CHUNK (null arrays,
  * inconsistent lengths, ids not strictly ascending) is a broken
  * index relation and throws — a silently null-dropped chunk would
  * quietly unassign every vector scored against it. */
case class CellTopNChunk(u: Expression, cents: Expression,
                         norms: Expression, ids: Expression, dim: Int, n: Int)
    extends Expression {

  require(dim > 0, s"cell_topn_chunk: dim=$dim must be positive")
  require(n > 0, s"cell_topn_chunk: n=$n must be positive")

  override def children: Seq[Expression] = Seq(u, cents, norms, ids)
  override def dataType: DataType = CellTopNChunk.outType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "cell_topn_chunk"

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(e: Expression, t: DataType) = e.dataType match {
      case ArrayType(et, _) => et == t
      case _ => false
    }
    val ok = arr(u, DoubleType) && arr(cents, DoubleType) &&
      arr(norms, DoubleType) && arr(ids, org.apache.spark.sql.types.LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "cell_topn_chunk requires (array<double>, array<double>, " +
        "array<double>, array<bigint>), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    def a(e: Expression): ArrayData = e.eval(input) match {
      case null => null
      case v => v.asInstanceOf[ArrayData]
    }
    CellTopNChunk.topn(a(u), a(cents), a(norms), a(ids), dim, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val uG = u.genCode(ctx); val cG = cents.genCode(ctx)
    val nG = norms.genCode(ctx); val iG = ids.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(code = code"""
      ${uG.code}
      ${cG.code}
      ${nG.code}
      ${iG.code}
      Object $boxed = graft.functions.CellTopNChunk.topn(
        ${uG.isNull} ? null : ${uG.value},
        ${cG.isNull} ? null : ${cG.value},
        ${nG.isNull} ? null : ${nG.value},
        ${iG.isNull} ? null : ${iG.value},
        $dim, $n);
      boolean ${ev.isNull} = ($boxed == null);
      $ad ${ev.value} = ${ev.isNull} ? null : ($ad) $boxed;
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CellTopNChunk =
    copy(u = newChildren(0), cents = newChildren(1),
      norms = newChildren(2), ids = newChildren(3))
}

object CellTopNChunk {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("ppm", LongType, nullable = false),
    StructField("cell", LongType, nullable = false))), containsNull = false)

  /** Shared by interpreted eval and generated code (named `topn`, not
    * `eval` — the [[CellArgMax.assign]] static-forwarder lesson).
    * Returns ArrayData of min(n, chunk-k) `(ppm, cell)` structs
    * ordered (ppm desc, id asc), null on vector-poison, THROWS on a
    * malformed chunk. */
  def topn(u: ArrayData, cents: ArrayData, norms: ArrayData,
           ids: ArrayData, dim: Int, n: Int): ArrayData = {
    if (cents == null || norms == null || ids == null)
      throw new IllegalArgumentException(
        "cell_topn_chunk: null centroid-chunk array — the chunked index " +
          "relation is malformed (builder bug, never row data)")
    val k = norms.numElements()
    if (cents.numElements() != k * dim || ids.numElements() != k || k == 0)
      throw new IllegalArgumentException(
        s"cell_topn_chunk: chunk holds ${cents.numElements()} centroid " +
          s"doubles / $k norms / ${ids.numElements()} ids, inconsistent " +
          s"with dim=$dim")
    if (u == null || u.numElements() != dim) return null
    val arr = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (u.isNullAt(j)) return null
      arr(j) = u.getDouble(j)
      j += 1
    }
    val m = math.min(n, k)
    val topP = new Array[Long](m)
    val topC = new Array[Int](m)
    var filled = 0
    var c = 0
    var prevId = Long.MinValue
    while (c < k) {
      // chunk-side null ELEMENTS are malformed-index, not row data:
      // a null norm would unbox to 0.0 and the /0.0 ppm would be
      // Long.MaxValue — a garbage winner silently displacing real
      // cells, the exact failure the loud contract forbids (r13
      // review finding)
      if (norms.isNullAt(c) || ids.isNullAt(c))
        throw new IllegalArgumentException(
          s"cell_topn_chunk: null norm/id element at index $c — the " +
            "chunked index relation is malformed")
      // same garbage-winner path for an explicit 0.0 / NaN / negative
      // / infinite norm (builders filter degenerate centroids before
      // chunking — semCells' `> 0` filter is the contract)
      val nv = norms.getDouble(c)
      if (!(nv > 0.0) || java.lang.Double.isInfinite(nv))
        throw new IllegalArgumentException(
          s"cell_topn_chunk: non-positive/non-finite norm $nv at index " +
            s"$c — the chunked index relation is malformed")
      // strictly-ascending ids make the ascending-index tie-break
      // identical to smallest-ID — the global combine's contract
      val id = ids.getLong(c)
      if (id <= prevId) throw new IllegalArgumentException(
        s"cell_topn_chunk: chunk ids not strictly ascending at index $c " +
          s"($prevId -> $id) — the tie-break contract needs sorted ids")
      prevId = id
      var acc = 0.0
      var i = 0
      val base = c * dim
      while (i < dim) {
        if (cents.isNullAt(base + i))
          throw new IllegalArgumentException(
            s"cell_topn_chunk: null centroid element at ${base + i} — " +
              "the chunked index relation is malformed")
        acc += arr(i) * cents.getDouble(base + i)
        i += 1
      }
      val p = math.floor(acc / nv * 1000000.0 + 0.5).toLong
      // packing precondition, enforced not just documented (ADVICE
      // r13): the global combine packs (p + 2e6)·2^41 + (idMask−cell),
      // which is order-correct and overflow-free only while
      // |p| ≤ 2e6 — true for any unit-normalized u against the
      // chunk's own norms (|cos|·1e6 ≤ 1e6, rounding slack aside). A
      // caller feeding non-normalized vectors would otherwise wrap
      // the packed Long SILENTLY and corrupt the global top-n order —
      // the one malformed-input class every other check here catches
      // loudly. A NaN dot never trips this (floor(NaN).toLong = 0,
      // inside the bound) — NaN row data keeps CellTopN bit-parity.
      if (p < -2000000L || p > 2000000L)
        throw new IllegalArgumentException(
          s"cell_topn_chunk: ppm=$p at index $c exceeds the ±2e6 packing " +
            "bound — the caller must unit-normalize vectors before the " +
            "chunk join (packed combine precondition)")
      filled = TopNInsert.insert(topP, topC, filled, m, p, c)
      c += 1
    }
    val rows = new Array[Any](filled)
    var o = 0
    while (o < filled) {
      rows(o) = org.apache.spark.sql.catalyst.InternalRow(
        topP(o), ids.getLong(topC(o)))
      o += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
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

  /** Column-level top-n cell selection (codegen'd; see [[CellTopN]]
    * for the (ppm desc, id asc) ordering contract). */
  def cellTopN(u: Column, cents: Array[Double], norms: Array[Double],
               ids: Array[Long], dim: Int, n: Int): Column =
    ColumnBridge.column(
      CellTopN(ColumnBridge.expression(u), cents, norms, ids, dim, n))

  /** Column-level chunked top-n cell selection (codegen'd; see
    * [[CellTopNChunk]] for the join-escalation and loud-malformed-chunk
    * contracts). `cents`/`norms`/`ids` are COLUMNS of one centroid
    * chunk row, not reference objects — this is the k-unbounded path. */
  def cellTopNChunk(u: Column, cents: Column, norms: Column, ids: Column,
                    dim: Int, n: Int): Column =
    ColumnBridge.column(
      CellTopNChunk(ColumnBridge.expression(u), ColumnBridge.expression(cents),
        ColumnBridge.expression(norms), ColumnBridge.expression(ids), dim, n))

  /** Column-level SRP sign-bit buckets (codegen'd; see [[SrpBuckets]]
    * for the bucket/probe layout). `planes` is the nTables×nBits×dim
    * hyperplane tensor flattened in (table, bit, component) order. */
  def srpBuckets(v: Column, planes: Array[Double], nTables: Int, nBits: Int,
                 dim: Int, withProbes: Boolean): Column =
    ColumnBridge.column(
      SrpBuckets(ColumnBridge.expression(v), planes, nTables, nBits, dim, withProbes))

  /** Column-level PQ encode packs / ADC LUT (codegen'd; see
    * [[PqKernel]] for the exact-ppm arithmetic contract). `codebook`
    * is (subspace, code, component)-major; `csq` the per-(subspace,
    * code) |c|² left folds. */
  def pqKernel(u: Column, codebook: Array[Double], csq: Array[Double],
               m: Int, k: Int, sub: Int, lut: Boolean): Column =
    ColumnBridge.column(
      PqKernel(ColumnBridge.expression(u), codebook, csq, m, k, sub, lut))

  /** Column-level L2 norm (codegen'd, same fold order as sum-of-squares). */
  def l2norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotp(a, a))

  /** Column-level prefix dot products (codegen'd; see [[PrefixDots]]
    * for the bit-equality-with-slices and null contracts). */
  def prefixDots(a: Column, b: Column, widths: Seq[Int]): Column =
    ColumnBridge.column(
      PrefixDots(ColumnBridge.expression(a), ColumnBridge.expression(b), widths))

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
