package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.model.Tables

class VectorExpressionsSpec extends SparkSpec {

  test("codegen'd dot_product matches the HOF aggregate/zip_with formulation bit-for-bit") {
    val e = Tables.embeddings(spark, sf)
      .withColumn("vd", expr("transform(embedding, x -> cast(x AS DOUBLE))"))
    val both = e.select(
      VectorFunctions.dotp(col("vd"), col("vd")).as("native"),
      expr("aggregate(zip_with(vd, vd, (x, y) -> x * y), cast(0.0 AS DOUBLE), (acc, v) -> acc + v)")
        .as("hof"))
    assert(both.filter(!(col("native") <=> col("hof"))).count() === 0)
    assert(both.count() > 0)
  }

  test("prefix_dots equals the 4-slice dot_product spelling bit-for-bit on real embeddings") {
    // the matryoshka kernel: one 64-element prefix pass must emit the
    // exact values of four independent dots over stored slices — the
    // fold at width w is a prefix of the same left-to-right sequence
    val widths = Seq(8, 16, 32, 64)
    val e = Tables.embeddings(spark, sf)
      .withColumn("vd", expr("transform(embedding, x -> cast(x AS DOUBLE))"))
      .limit(50)
    val pairs = e.select(col("vec_id").as("ida"), col("vd").as("va"))
      .crossJoin(e.select(col("vec_id").as("idb"), col("vd").as("vb")))
    val both = pairs.select(
      VectorFunctions.prefixDots(col("va"), col("vb"), widths).as("pd"),
      array(widths.map(w => VectorFunctions.dotp(
        slice(col("va"), 1, w), slice(col("vb"), 1, w))): _*).as("sliced"))
    // null-safe: pd null where the slice spelling is not must count
    // as a mismatch, not vanish into a NULL-filtered row (ADVICE r12)
    assert(both.filter(!(col("pd") <=> col("sliced"))).count() === 0)
    assert(both.count() === 2500)
  }

  test("prefix_dots null contract: ragged, short, and null-element inputs poison the whole array") {
    import spark.implicits._
    val widths = Seq(2, 4)
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0), Seq[java.lang.Double](1.0, 1.0, 1.0, 1.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 1.0, 1.0, 1.0)), // ragged
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0)), // shorter than max width
      (Seq[java.lang.Double](1.0, null, 3.0, 4.0), Seq[java.lang.Double](1.0, 1.0, 1.0, 1.0)) // null elem
    ).toDF("a", "b")
    val out = df.select(
      VectorFunctions.prefixDots(col("a"), col("b"), widths).as("pd")).collect()
    assert(out(0).getSeq[Double](0) === Seq(3.0, 10.0))
    assert(out(1).isNullAt(0) && out(2).isNullAt(0) && out(3).isNullAt(0))
  }

  test("dot_product is null on null input and callable from SQL after registration") {
    VectorFunctions.register(spark)
    val row = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
                dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS n""").head()
    assert(row.getDouble(0) === 32.0)
    assert(row.isNullAt(1))
  }

  test("cell_argmax equals the packed-long greatest() spelling on real embeddings") {
    // the kernel replaced semCells' literal spelling for PLAN-SIZE
    // cost only — this pins value equality on real unit vectors
    // against randomly-chosen centroids, including the tie-break
    // (max ppm-dot, then SMALLEST cell id) and the /norm-before-floor
    // order. Uses floor(x+0.5) ppm (Money.cents), the semCells
    // contract.
    val e = Tables.embeddings(spark, sf)
      .withColumn("vd", expr("transform(embedding, x -> cast(x AS DOUBLE))"))
      .withColumn("nrm", expr(
        "sqrt(aggregate(transform(vd, x -> x * x), cast(0.0 AS DOUBLE), (a, v) -> a + v))"))
      .select(col("vec_id"), expr("transform(vd, x -> x / nrm)").as("u"))
    val dim = e.select(size(col("u"))).head().getInt(0)
    // centroids: 7 deterministic pseudo-random unit-ish vectors with
    // distinct norms, plus cell 3 DUPLICATING cell 1 so ties occur on
    // every row — the tie-break is exercised, not just hoped for
    def cent(c: Int): Array[Double] =
      Array.tabulate(dim)(j => math.sin(c * 31 + j * 7 + 1) / math.sqrt(dim))
    val cents: Array[Array[Double]] = Array(cent(0), cent(1), cent(2), cent(1),
      cent(4), cent(5), cent(6))
    val norms = Array(1.0, 0.7, 1.3, 0.7, 1.0, 0.9, 1.1)
    val ids = Array.tabulate(7)(_.toLong)
    def pack(dotPpm: org.apache.spark.sql.Column, cell: Int) =
      (dotPpm + lit(2000000L)) * lit(1048576L) + lit(1048575L - cell)
    val packed = e.withColumn("expected",
      lit(1048575L) - pmod(greatest(cents.toSeq.zipWithIndex.map { case (s, i) =>
        pack(graft.model.Money.cents(
          VectorFunctions.dotp(col("u"), typedLit(s.toSeq)) / lit(norms(i)),
          1000000.0), i)
      }: _*), lit(1048576L)))
      .withColumn("native",
        VectorFunctions.cellArgMax(col("u"), cents.flatten, norms, ids, dim))
    assert(packed.filter(col("native") =!= col("expected")).count() === 0)
    assert(packed.count() > 0)
    // cells 1 and 3 are identical (centroid AND norm): the packed
    // spelling always prefers the smaller id, so cell 3 must never win
    assert(packed.filter(col("native") === 3L).count() === 0)
    // null element / ragged length poison (the DotProduct contract)
    val row = spark.range(1).select(
      VectorFunctions.cellArgMax(
        expr("array(1.0D, CAST(NULL AS DOUBLE))"),
        Array(1.0, 0.0), Array(1.0), Array(0L), 2).as("ne"),
      VectorFunctions.cellArgMax(
        expr("array(1.0D)"), Array(1.0, 0.0), Array(1.0), Array(0L), 2).as("rg"))
      .head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("cell_topn equals the packed-long array_sort spelling on real embeddings") {
    // CellTopN replaced the IVF probe list's k literal typedLit packs
    // for PLAN-SIZE cost only — this pins value equality (order
    // included) against the packed spelling it retired:
    // slice(reverse(array_sort(array(k packs))), 1, n) decoded, i.e.
    // (ppm desc, cell id asc). Duplicate centroids make ties real.
    val e = Tables.embeddings(spark, sf)
      .withColumn("vd", expr("transform(embedding, x -> cast(x AS DOUBLE))"))
      .withColumn("nrm", expr(
        "sqrt(aggregate(transform(vd, x -> x * x), cast(0.0 AS DOUBLE), (a, v) -> a + v))"))
      .select(col("vec_id"), expr("transform(vd, x -> x / nrm)").as("u"))
    val dim = e.select(size(col("u"))).head().getInt(0)
    def cent(c: Int): Array[Double] =
      Array.tabulate(dim)(j => math.sin(c * 31 + j * 7 + 1) / math.sqrt(dim))
    val cents: Array[Array[Double]] = Array(cent(0), cent(1), cent(2), cent(1),
      cent(4), cent(5), cent(6))
    val norms = Array(1.0, 0.7, 1.3, 0.7, 1.0, 0.9, 1.1)
    val ids = Array.tabulate(7)(_.toLong)
    val n = 3
    def pack(dotPpm: org.apache.spark.sql.Column, cell: Int) =
      (dotPpm + lit(2000000L)) * lit(1048576L) + lit(1048575L - cell)
    val withPks = e.withColumn("pks",
      slice(reverse(array_sort(array(cents.toSeq.zipWithIndex.map { case (s, i) =>
        pack(graft.model.Money.cents(
          VectorFunctions.dotp(col("u"), typedLit(s.toSeq)) / lit(norms(i)),
          1000000.0), i)
      }: _*))), 1, n))
      .withColumn("expected",
        expr(s"transform(pks, p -> ${1048575L}L - (p % ${1048576L}L))"))
      .withColumn("native",
        VectorFunctions.cellTopN(col("u"), cents.flatten, norms, ids, dim, n))
    assert(withPks.filter(col("native") =!= col("expected")).count() === 0)
    assert(withPks.count() > 0)
    // the duplicate centroid pair (cells 1 and 3): whenever cell 3
    // appears, cell 1 must appear BEFORE it (smaller-id-first ties)
    assert(withPks.filter(
      array_position(col("native"), 3L) > lit(0) &&
      (array_position(col("native"), 1L) === 0 ||
       array_position(col("native"), 1L) > array_position(col("native"), 3L)))
      .count() === 0)
    // n >= k returns all k cells, still ordered
    val allK = e.withColumn("nat",
      VectorFunctions.cellTopN(col("u"), cents.flatten, norms, ids, dim, 99))
    assert(allK.filter(size(col("nat")) =!= lit(7)).count() === 0)
    // null element / ragged length poison (the CellArgMax contract);
    // head of the top-n always equals cell_argmax
    val agree = e.select(
      VectorFunctions.cellTopN(col("u"), cents.flatten, norms, ids, dim, n)
        .getItem(0).as("top1"),
      VectorFunctions.cellArgMax(col("u"), cents.flatten, norms, ids, dim).as("am"))
    assert(agree.filter(col("top1") =!= col("am")).count() === 0)
    val row = spark.range(1).select(
      VectorFunctions.cellTopN(
        expr("array(1.0D, CAST(NULL AS DOUBLE))"),
        Array(1.0, 0.0), Array(1.0), Array(0L), 2, 1).as("ne"),
      VectorFunctions.cellTopN(
        expr("array(1.0D)"), Array(1.0, 0.0), Array(1.0), Array(0L), 2, 1).as("rg"))
      .head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("cell_topn generated code actually COMPILES (no silent interpreted fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val cents = Array(1.0, 0.0, 0.0, 1.0, 0.7, 0.7) // 3 cells x dim 2
    val e = graft.functions.CellTopN(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      cents, Array(1.0, 1.0, 1.0), Array(0L, 1L, 2L), 2, 2)
    val proj = GenerateUnsafeProjection.generate(Seq(e)) // throws on Janino failure
    val out = proj(InternalRow(ArrayData.toArrayData(Array(0.1, 0.9))))
    val arr = out.getArray(0)
    assert(arr.numElements() === 2)
    assert(arr.getLong(0) === 1L) // dot 0.9
    assert(arr.getLong(1) === 2L) // dot 0.7
    val nul = proj(InternalRow(null))
    assert(nul.isNullAt(0))
  }

  test("srp_buckets equals the literal per-plane spelling on real embeddings") {
    // SrpBuckets replaced the per-(table, bit) dotp(vd, typedLit(..))
    // trees in the SRP index derivations for PLAN-SIZE cost only —
    // this pins bucket AND flipped-probe equality against the exact
    // column spelling it retired (sign sums; first-argmin-|dot| flip).
    val nT = 3; val nB = 5
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val e = Tables.embeddings(spark, sf)
      .withColumn("vd", expr("transform(embedding, x -> cast(x AS DOUBLE))"))
    val dim = e.select(size(col("vd"))).head().getInt(0)
    val planes = Array.tabulate(nT, nB, dim) { (t, p, j) =>
      h60(s"${t}_${p}_${j}") / math.pow(2, 59) - 1.0
    }
    // retired spelling: per-table sign-bit sums + weakest-bit flip
    val bkCols = planes.toSeq.map { tp =>
      tp.toSeq.zipWithIndex.map { case (plane, p) =>
        when(VectorFunctions.dotp(col("vd"), typedLit(plane.toSeq)) >= 0,
          lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val withDots = e.withColumn("ds", array(planes.toSeq.map(tp =>
      array(tp.toSeq.map(p =>
        VectorFunctions.dotp(col("vd"), typedLit(p.toSeq))): _*)): _*))
      .withColumn("ebks", array(bkCols: _*))
      .withColumn("wks", expr(
        s"""transform(sequence(0, ${nT - 1}),
              t -> array_position(transform(ds[t], x -> abs(x)),
                                  array_min(transform(ds[t], x -> abs(x)))) - 1)"""))
      .withColumn("efps", expr(
        s"""transform(sequence(0, ${nT - 1}),
              t -> ebks[t] ^ shiftleft(cast(1 AS bigint), cast(wks[t] AS int)))"""))
      .withColumn("bf", VectorFunctions.srpBuckets(
        col("vd"), planes.flatten.flatten, nT, nB, dim, withProbes = true))
      .withColumn("nbks", slice(col("bf"), 1, nT))
      .withColumn("nfps", slice(col("bf"), nT + 1, nT))
      .withColumn("short", VectorFunctions.srpBuckets(
        col("vd"), planes.flatten.flatten, nT, nB, dim, withProbes = false))
    assert(withDots.filter(col("nbks") =!= col("ebks")).count() === 0)
    assert(withDots.filter(col("nfps") =!= col("efps")).count() === 0)
    // withProbes=false is exactly the buckets half
    assert(withDots.filter(col("short") =!= col("nbks")).count() === 0)
    assert(withDots.count() > 0)
    // null element / ragged length poison
    val row = spark.range(1).select(
      VectorFunctions.srpBuckets(
        expr("array(1.0D, CAST(NULL AS DOUBLE))"),
        Array(1.0, 0.0), 1, 1, 2, withProbes = true).as("ne"),
      VectorFunctions.srpBuckets(
        expr("array(1.0D)"), Array(1.0, 0.0), 1, 1, 2, withProbes = false).as("rg"))
      .head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("null-element vectors are excluded from LSH blocking, not bucketed to zero") {
    // Contract change vs the retired when(dot>=0,..).otherwise(0)
    // spelling (which would file a corrupt vector under bucket 0 of
    // EVERY table, pairing all corrupt vectors with each other and
    // with every legitimately-bucket-0 vector): the kernel nulls the
    // bucket array and posexplode of null emits NO rows — the vector
    // simply never enters the blocking index. Documented at
    // Similarity.srpBucketArray; this test is the pin.
    val vecs = spark.range(3).selectExpr(
      "id AS vec_id",
      """CASE WHEN id = 1 THEN array(1.0D, CAST(NULL AS DOUBLE))
              ELSE array(CAST(id AS DOUBLE), 1.0D) END AS vd""")
    val exploded = vecs
      .withColumn("bks", VectorFunctions.srpBuckets(
        col("vd"), Array(1.0, 0.0, 0.0, -1.0), 1, 2, 2, withProbes = false))
      .select(col("vec_id"), posexplode(col("bks")))
    val survivors = exploded.select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(survivors === Set(0L, 2L),
      s"corrupt vector must vanish from the blocking index, got $survivors")
  }

  test("srp_buckets generated code actually COMPILES (no silent interpreted fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // 1 table x 2 bits over dim 2: planes (1,0) and (0,-1)
    val planes = Array(1.0, 0.0, 0.0, -1.0)
    val e = graft.functions.SrpBuckets(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      planes, 1, 2, 2, withProbes = true)
    val proj = GenerateUnsafeProjection.generate(Seq(e)) // throws on Janino failure
    val out = proj(InternalRow(ArrayData.toArrayData(Array(0.9, 0.1))))
    val arr = out.getArray(0)
    assert(arr.numElements() === 2)
    // dots: 0.9 (bit 0 set), -0.1 (bit 1 clear) -> bucket 1; weakest
    // |dot| is plane 1 (0.1 < 0.9) -> flip bit 1 -> probe 3
    assert(arr.getLong(0) === 1L)
    assert(arr.getLong(1) === 3L)
    val nul = proj(InternalRow(null))
    assert(nul.isNullAt(0))
  }

  test("pq_packs / pq_lut equal the literal slice-dot spelling on real embeddings") {
    // PqKernel replaced the per-(subspace, code) dotp(us_s,
    // typedLit(slice)) trees in the PQ encode/LUT for PLAN-SIZE cost
    // only — this pins pack AND LUT equality against the exact
    // spelling it retired (dot-identity d², ppm floors, packed argmin
    // with smallest-code ties).
    val m = 4; val k = 8; val subDim = 16
    val e = Tables.embeddings(spark, sf)
      .withColumn("vd", expr("transform(embedding, x -> cast(x AS DOUBLE))"))
      .withColumn("nrm", expr(
        "sqrt(aggregate(transform(vd, x -> x * x), cast(0.0 AS DOUBLE), (a, v) -> a + v))"))
      .select(col("vec_id"), expr("transform(vd, x -> x / nrm)").as("u"))
    val dim = e.select(size(col("u"))).head().getInt(0)
    assert(dim === m * subDim, s"fixture dim $dim != $m x $subDim")
    // deterministic codebook: k pseudo-random full vectors, sliced
    def seed(j: Int): Array[Double] =
      Array.tabulate(dim)(i => math.sin(j * 17 + i * 3 + 2) / math.sqrt(dim))
    val seeds = Array.tabulate(k)(seed)
    val cb = new Array[Double](m * k * subDim)
    val csqA = new Array[Double](m * k)
    for (s <- 0 until m; j <- 0 until k) {
      val cs = seeds(j).slice(s * subDim, (s + 1) * subDim)
      System.arraycopy(cs, 0, cb, (s * k + j) * subDim, subDim)
      csqA(s * k + j) = cs.foldLeft(0.0)((a, x) => a + x * x)
    }
    // the retired literal spelling
    val sliced = e
      .select(col("vec_id") +: col("u") +:
        (0 until m).map(s => slice(col("u"), s * subDim + 1, subDim).as(s"us$s")): _*)
    val withSq = sliced.select(col("vec_id") +: col("u") +:
      ((0 until m).map(s => col(s"us$s")) ++
       (0 until m).map(s =>
         VectorFunctions.dotp(col(s"us$s"), col(s"us$s")).as(s"usq$s"))): _*)
    def dist2Ppm(s: Int, j: Int) = {
      val cs = seeds(j).slice(s * subDim, (s + 1) * subDim)
      val csq = cs.foldLeft(0.0)((a, x) => a + x * x)
      floor((col(s"usq$s") - lit(2.0) *
        VectorFunctions.dotp(col(s"us$s"), typedLit(cs.toSeq)) + lit(csq))
        * lit(1000000.0) + lit(0.5)).cast("long")
    }
    val ePacks = array((0 until m).map(s =>
      least((0 until k).map(j => dist2Ppm(s, j) * k + lit(j)): _*)): _*)
    val eLut = array((for (s <- 0 until m; j <- 0 until k) yield {
      val cs = seeds(j).slice(s * subDim, (s + 1) * subDim)
      floor(VectorFunctions.dotp(col(s"us$s"), typedLit(cs.toSeq))
        * lit(1000000.0) + lit(0.5)).cast("long")
    }): _*)
    val both = withSq
      .withColumn("epacks", ePacks)
      .withColumn("elut", eLut)
      .withColumn("npacks",
        VectorFunctions.pqKernel(col("u"), cb, csqA, m, k, subDim, lut = false))
      .withColumn("nlut",
        VectorFunctions.pqKernel(col("u"), cb, csqA, m, k, subDim, lut = true))
    assert(both.filter(col("npacks") =!= col("epacks")).count() === 0)
    assert(both.filter(col("nlut") =!= col("elut")).count() === 0)
    assert(both.count() > 0)
    // null element / ragged length poison
    val row = spark.range(1).select(
      VectorFunctions.pqKernel(expr("array(1.0D, CAST(NULL AS DOUBLE))"),
        Array(1.0, 0.0), Array(1.0), 1, 1, 2, lut = false).as("ne"),
      VectorFunctions.pqKernel(expr("array(1.0D)"),
        Array(1.0, 0.0), Array(1.0), 1, 1, 2, lut = true).as("rg"))
      .head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("pq kernel generated code actually COMPILES (no silent interpreted fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // m=1 subspace, k=2 codes, sub=2: codes (1,0) and (0,1)
    val cb = Array(1.0, 0.0, 0.0, 1.0)
    val csq = Array(1.0, 1.0)
    val packs = graft.functions.PqKernel(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      cb, csq, 1, 2, 2, lut = false)
    val lut = graft.functions.PqKernel(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      cb, csq, 1, 2, 2, lut = true)
    val proj = GenerateUnsafeProjection.generate(Seq(packs, lut))
    val out = proj(InternalRow(
      ArrayData.toArrayData(Array(0.6, 0.8)), ArrayData.toArrayData(Array(0.6, 0.8))))
    val pk = out.getArray(0)
    assert(pk.numElements() === 1)
    // d²(code0) = 1 - 1.2 + 1 = 0.8; d²(code1) = 1 - 1.6 + 1 = 0.4 ->
    // code 1 wins: pk = 400000*2 + 1
    assert(pk.getLong(0) === 800001L)
    val lt = out.getArray(1)
    assert(lt.numElements() === 2)
    assert(lt.getLong(0) === 600000L)
    assert(lt.getLong(1) === 800000L)
    val nul = proj(InternalRow(null, null))
    assert(nul.isNullAt(0) && nul.isNullAt(1))
  }

  test("dot_product is null on ragged (length-mismatched) arrays, like the HOF formulation") {
    VectorFunctions.register(spark)
    // range-derived so the check exercises generated code, not an
    // interpreted constant fold
    val df = spark.range(3).selectExpr(
      "dot_product(array(1.0D, 2.0D), array(cast(id AS DOUBLE))) AS ragged",
      """aggregate(zip_with(array(1.0D, 2.0D), array(cast(id AS DOUBLE)), (x, y) -> x * y),
                   cast(0.0 AS DOUBLE), (acc, v) -> acc + v) AS hof""")
    assert(df.filter(col("ragged").isNotNull).count() === 0)
    assert(df.filter(col("hof").isNotNull).count() === 0)
  }

  test("dot_product rejects wrong arity and wrong input types at analysis") {
    VectorFunctions.register(spark)
    val arity = intercept[Exception](spark.sql("SELECT dot_product(array(1.0D))").head())
    assert(arity.getMessage.contains("exactly 2 arguments"), arity.getMessage)
    val typed = intercept[Exception](spark.sql("SELECT dot_product('a', 'b')").head())
    assert(typed.getMessage.toLowerCase.contains("array<double>"), typed.getMessage)
  }

  test("shingle_hash equals the HOF md5/conv formulation on real documents") {
    val d = Tables.documents(spark, sf)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
    val both = d.select(
      array_sort(graft.functions.ShingleHash.shingleHashes(col("toks"), 3)).as("native"),
      array_sort(expr(
        """array_distinct(transform(sequence(1, size(toks) - 2),
           i -> cast(conv(substring(md5(cast(concat_ws(' ', slice(toks, i, 3)) AS binary)), 1, 15), 16, 10) AS bigint)))"""))
        .as("hof"))
    assert(both.filter(!(col("native") <=> col("hof"))).count() === 0)
    assert(both.count() > 0)
  }

  test("the graft SQL function surface: all natives callable from pure SQL") {
    // an isolated child session: registerAll uses the same builder list
    // GraftExtensions injects at build time (they cannot drift), and a
    // pre-existing shared test session never sees build-time extensions
    val s2 = spark.newSession()
    graft.functions.GraftFunctions.registerAll(s2)
    val viaSql = s2.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                shingle_hash(array('a', 'b', 'c', 'd'), 3) AS sh,
                shingle_hash(array('a', 'b', 'c', 'd'), 3, false) AS shp,
                wire_timestamp('2021-03-07 19:01:23.456+0000') AS ts""").head()
    assert(viaSql.getDouble(0) == 11.0)
    assert(viaSql.getSeq[Long](1).sorted == viaSql.getSeq[Long](2).sorted,
      "positional and distinct modes must hash identical windows here")
    assert(viaSql.getTimestamp(3) ==
      java.sql.Timestamp.valueOf("2021-03-07 19:01:23.456"))
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted real shingle arrays") {
    val d = Tables.documents(spark, sf)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("shs", sort_array(
        graft.functions.ShingleHash.shingleHashes(col("toks"), 3)))
    // all (i, i+1) consecutive doc pairs + self-pairs: covers disjoint,
    // partial-overlap and identical-array cases on real data
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
    val pairs = d.select(col("doc_id"), col("shs"))
      .withColumn("nxt", lead(col("shs"), 1).over(w))
      .filter(col("nxt").isNotNull)
    val both = pairs.select(
      VectorFunctions.sortedIntersectCount(col("shs"), col("nxt")).as("native"),
      size(array_intersect(col("shs"), col("nxt"))).as("builtin"),
      VectorFunctions.sortedIntersectCount(col("shs"), col("shs")).as("self"),
      size(col("shs")).as("n"))
    assert(both.filter(col("native") =!= col("builtin")).count() === 0)
    assert(both.filter(col("self") =!= col("n")).count() === 0)
    assert(both.count() > 0)
  }

  test("shingle_hash distinct output is sorted ascending — the prefix-filter kernel's contract") {
    // Dedup.prefixFilter feeds these arrays to sorted_intersect_count
    // WITHOUT re-sorting, relying on ShingleHash's documented
    // "DISTINCT (sorted)" output; a producer ordering change must fail
    // here, not corrupt the two-pointer merge silently
    val d = Tables.documents(spark, sf)
      .withColumn("shs", graft.functions.ShingleHash.shingleHashes(
        split(col("text"), " "), 3))
    assert(d.filter(col("shs") =!= array_sort(col("shs"))).count() === 0)
    assert(d.count() > 0)
  }

  test("sorted_intersect_count: null/empty arrays, null ELEMENTS, SQL registration, codegen span") {
    val s2 = spark.newSession()
    graft.functions.GraftFunctions.registerAll(s2)
    val row = s2.sql(
      """SELECT sorted_intersect_count(array(1L, 3L, 7L), array(2L, 3L, 7L, 9L)) AS c,
                sorted_intersect_count(array(1L), CAST(NULL AS ARRAY<BIGINT>)) AS n,
                sorted_intersect_count(CAST(array() AS ARRAY<BIGINT>), array(1L)) AS e,
                sorted_intersect_count(array(1L, CAST(NULL AS BIGINT), 5L),
                                       array(1L, 5L)) AS ne""").head()
    assert(row.getInt(0) === 2)
    assert(row.isNullAt(1))
    assert(row.getInt(2) === 0)
    // a null ELEMENT must null-poison (DotProduct's contract), never
    // read the raw slot as 0 and return a plausible wrong count
    assert(row.isNullAt(3))
    val d = Tables.documents(spark, sf)
      .withColumn("shs", sort_array(graft.functions.ShingleHash.shingleHashes(
        split(col("text"), " "), 3)))
      .select(VectorFunctions.sortedIntersectCount(col("shs"), col("shs")).as("c"))
    val planLine = d.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("sorted_intersect_count")).getOrElse("")
    assert(planLine.trim.startsWith("*("),
      s"sorted_intersect_count not in a codegen span: $planLine")
  }

  test("RewriteHofDotProduct: HOF pattern becomes the kernel; near-misses are left alone") {
    val s2 = spark.newSession()
    s2.experimental.extraOptimizations = Seq(graft.plans.RewriteHofDotProduct)
    // range-derived (non-foldable — a literal LocalRelation gets
    // whole-plan constant-folded before the plan can be inspected):
    // row 0 = normal, row 1 = ragged, row 2 = both empty, row 3 = null array
    def src(s: org.apache.spark.sql.SparkSession) = s.range(4).selectExpr(
      """CASE WHEN id = 0 THEN array(1.0D, 2.0D, 3.0D)
              WHEN id = 1 THEN array(1.0D, 2.0D)
              WHEN id = 2 THEN cast(array() AS array<double>)
              ELSE cast(NULL AS array<double>) END AS a""",
      """CASE WHEN id = 0 THEN array(4.0D, 5.0D, 6.0D)
              WHEN id = 1 THEN array(4.0D, 5.0D, 6.0D)
              WHEN id = 2 THEN cast(array() AS array<double>)
              ELSE array(1.0D) END AS b""",
      "id")
    val hof = """aggregate(zip_with(a, b, (x, y) -> x * y),
                           cast(0.0 AS DOUBLE), (acc, v) -> acc + v)"""
    val q = src(s2).selectExpr(s"$hof AS d", "id")
    assert(q.queryExecution.optimizedPlan.toString.contains("dot_product"),
      s"pattern not rewritten:\n${q.queryExecution.optimizedPlan}")
    // identical results to the un-rewritten session (null cases included)
    def vals(df: org.apache.spark.sql.DataFrame): Seq[Any] =
      df.orderBy("id").collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    assert(vals(q) == vals(src(spark).selectExpr(s"$hof AS d", "id")))
    assert(vals(q) == Seq(32.0, null, 0.0, null))
    // near-misses must NOT fire: reversed multiply operands, wrong zero,
    // an extra term in the merge
    for (miss <- Seq(
      "aggregate(zip_with(a, b, (x, y) -> y * x), cast(0.0 AS DOUBLE), (acc, v) -> acc + v)",
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(1.0 AS DOUBLE), (acc, v) -> acc + v)",
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 AS DOUBLE), (acc, v) -> acc + v + 0.0)")) {
      val p = src(s2).selectExpr(s"$miss AS d")
      assert(!p.queryExecution.optimizedPlan.toString.contains("dot_product"),
        s"near-miss was wrongly rewritten: $miss")
    }
  }

  test("cell_argmax generated code actually COMPILES (no silent interpreted fallback)") {
    // a DataFrame run can pass even when doGenCode emits broken Java —
    // Spark logs the Janino error and falls back to interpreted eval,
    // taking the whole stage out of codegen. GenerateUnsafeProjection
    // throws on compile failure, so this pins the codegen path itself.
    // (Regression: the companion helper was named `eval`, which clashes
    // with Expression.eval(InternalRow) and suppresses Scala's static
    // forwarder — generated `CellArgMax.eval(...)` then failed to
    // resolve and every cell-assignment stage ran interpreted.)
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val cents = Array(1.0, 0.0, 0.0, 1.0) // 2 cells x dim 2
    val e = graft.functions.CellArgMax(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      cents, Array(1.0, 1.0), Array(0L, 1L), 2)
    val proj = GenerateUnsafeProjection.generate(Seq(e)) // throws on Janino failure
    val out = proj(InternalRow(ArrayData.toArrayData(Array(0.1, 0.9))))
    assert(out.getLong(0) === 1L)
    val nul = proj(InternalRow(null))
    assert(nul.isNullAt(0))
  }

  test("dot_product stays inside whole-stage codegen") {
    val e = Tables.embeddings(spark, sf)
      .withColumn("vd", expr("transform(embedding, x -> cast(x AS DOUBLE))"))
      .select(VectorFunctions.dotp(col("vd"), col("vd")).as("d"))
    // the `*(n)` prefix marks a WholeStageCodegen span in the plan string
    val planLine = e.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("dot_product")).getOrElse("")
    assert(planLine.trim.startsWith("*("), s"dot_product not in a codegen span: $planLine")
  }
}
