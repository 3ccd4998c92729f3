package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.model.Tables
import graft.queries.Similarity

/** Pins the inverted-file-join escalation (r12 verdict task 1): cell
  * assignment and top-n probing through the chunked centroid RELATION
  * must be BIT-EQUAL to the CellArgMax/CellTopN reference-object
  * kernels wherever both are legal — same ppm arithmetic, same
  * (ppm desc, id asc) order, same smallest-id tie-break even when the
  * tied centroids land in DIFFERENT chunks, same null poison for bad
  * vectors. The join path is forced onto fixture-sized matrices by
  * shrinking chunkSize below k; production dispatch only takes it past
  * 4096 cells.
  */
class CellChunkParitySpec extends SparkSpec {

  private val dim = 64

  /** Real unit vectors plus three poison rows (null element, ragged
    * length, null array) under vec_ids no fixture uses. */
  private lazy val vecs: DataFrame = {
    val e = Tables.embeddings(spark, sf)
      .withColumn("vd", expr("transform(embedding, x -> cast(x AS DOUBLE))"))
      .withColumn("nrm", VectorFunctions.l2norm(col("vd")))
      .select(col("vec_id"), expr("transform(vd, x -> x / nrm)").as("u"))
    val poison = spark.range(1).select(
      lit(9999990L).as("vec_id"),
      expr(s"transform(sequence(1, $dim), i -> CASE WHEN i = 1 " +
        "THEN CAST(NULL AS DOUBLE) ELSE 0.5D END)").as("u"))
      .union(spark.range(1).select(lit(9999991L).as("vec_id"),
        expr(s"array_repeat(0.5D, ${dim - 1})").as("u")))
      .union(spark.range(1).select(lit(9999992L).as("vec_id"),
        expr("CAST(NULL AS ARRAY<DOUBLE>)").as("u")))
    e.union(poison)
  }

  // 7 centroids with cell 3 DUPLICATING cell 1 (vector AND norm): at
  // chunkSize 2 the tied pair lands in chunks {0,1} and {2,3} — the
  // smallest-id tie-break must hold ACROSS the chunk combine, not just
  // inside one kernel call
  private def cent(c: Int): Array[Double] =
    Array.tabulate(dim)(j => math.sin(c * 31 + j * 7 + 1) / math.sqrt(dim))
  private val cents: Array[Array[Double]] =
    Array(cent(0), cent(1), cent(2), cent(1), cent(4), cent(5), cent(6))
  private val norms = Array(1.0, 0.7, 1.3, 0.7, 1.0, 0.9, 1.1)
  private val ids = Array.tabulate(7)(_.toLong)

  test("chunked assignment is bit-equal to the CellArgMax kernel, poison included") {
    val kernel = Similarity.assignCellsAnyK(vecs, "vec_id", col("u"),
      cents.flatten, norms, ids, dim, "cell_k")
    val joined = Similarity.assignCellsAnyK(kernel, "vec_id", col("u"),
      cents.flatten, norms, ids, dim, "cell_j", chunkSize = 2)
    val diff = joined.filter(!(col("cell_k") <=> col("cell_j")))
    assert(diff.count() === 0, diff.select("vec_id", "cell_k", "cell_j")
      .limit(5).collect().mkString(", "))
    // the tie pair: cell 3 must never win in EITHER path
    assert(joined.filter(col("cell_j") === 3L).count() === 0)
    // duplicate-of-1 ties actually occur (cell 1 wins some rows), so
    // the cross-chunk tie-break was exercised, not vacuous
    assert(joined.filter(col("cell_j") === 1L).count() > 0)
    // poison rows: null in the join path too, never a plausible cell
    assert(joined.filter(col("vec_id") >= 9999990L &&
      col("cell_j").isNotNull).count() === 0)
    assert(joined.filter(col("vec_id") >= 9999990L).count() === 3)
  }

  test("chunked top-n probing is bit-equal to the CellTopN kernel, order included") {
    val kernel = Similarity.topCellsAnyK(vecs, "vec_id", col("u"),
      cents.flatten, norms, ids, dim, 3, "top_k")
    val joined = Similarity.topCellsAnyK(kernel, "vec_id", col("u"),
      cents.flatten, norms, ids, dim, 3, "top_j", chunkSize = 2)
    val diff = joined.filter(!(col("top_k") <=> col("top_j")))
    assert(diff.count() === 0, diff.select("vec_id", "top_k", "top_j")
      .limit(5).collect().mkString(", "))
    // whenever the duplicate pair both make the top-3, 1 precedes 3
    assert(joined.filter(array_position(col("top_j"), 3L) > lit(0) &&
      (array_position(col("top_j"), 1L) === 0 ||
        array_position(col("top_j"), 1L) >
          array_position(col("top_j"), 3L))).count() === 0)
    assert(joined.filter(col("vec_id") >= 9999990L &&
      col("top_j").isNotNull).count() === 0)
  }

  test("n larger than k: both paths emit all k cells, same order") {
    val kernel = Similarity.topCellsAnyK(vecs.limit(50), "vec_id", col("u"),
      cents.flatten, norms, ids, dim, 20, "top_k")
    val joined = Similarity.topCellsAnyK(kernel, "vec_id", col("u"),
      cents.flatten, norms, ids, dim, 20, "top_j", chunkSize = 3)
    assert(joined.filter(!(col("top_k") <=> col("top_j"))).count() === 0)
    assert(joined.filter(col("top_j").isNotNull &&
      size(col("top_j")) =!= 7).count() === 0)
  }

  test("distributed trainer: bit-deterministic chunks, full cell cover, high assignment agreement with the driver trainer") {
    // the fully-distributed k-means (ivfTrainChunks) must (a) produce
    // a WELL-FORMED chunk relation — every cell id 0..k-1 exactly
    // once, unit norms, k·dim centroid doubles; (b) be BIT-
    // DETERMINISTIC across runs (its Lloyd sums are exact ppm
    // BIGINTs — order-independent — where the driver trainer's double
    // sums are only locally stable); (c) train essentially the same
    // index as the driver trainer on the same data (assignments may
    // differ only where a vector sits near a cell boundary and the
    // ppm-vs-double centroid ulps flip it — a small, stable fraction)
    val e = Tables.embeddings(spark, sf)
      .withColumn("vd", expr("transform(embedding, x -> cast(x AS DOUBLE))"))
      .withColumn("nrm", VectorFunctions.l2norm(col("vd")))
      .select(col("vec_id"), col("vd"), col("nrm"))
    val k = 16
    def trainOnce() = Similarity.ivfTrainChunks(e, k, iters = 2,
      sampleMod = 3, dim, chunkSize = 5) // 4 chunks of <= 5 cells
    val c1 = trainOnce().collect().sortBy(_.getSeq[Long](2).head)
    val c2 = trainOnce().collect().sortBy(_.getSeq[Long](2).head)
    assert(c1.length === 4)
    assert(c1.map(_.getSeq[Long](2)).flatten.sorted.toSeq ===
      (0L until k.toLong))
    assert(c1.flatMap(_.getSeq[Double](1)).forall(_ == 1.0))
    assert(c1.map(_.getSeq[Double](0).length).sum === k * dim)
    // bit-determinism: every double in every chunk identical across runs
    assert(c1.zip(c2).forall { case (a, b) =>
      a.getSeq[Double](0) == b.getSeq[Double](0) &&
        a.getSeq[Long](2) == b.getSeq[Long](2)
    }, "ivfTrainChunks must be bit-deterministic run to run")
    // assignment agreement vs the driver trainer on the same corpus
    val eu = e.withColumn("u", expr("transform(vd, x -> x / nrm)"))
    val driverCents = Similarity.ivfTrain(e, k, iters = 2, sampleMod = 3)
    val viaDriver = Similarity.assignCellsAnyK(eu, "vec_id", col("u"),
      driverCents.flatten, Array.fill(k)(1.0),
      Array.tabulate(k)(_.toLong), dim, "cell_d")
    val viaChunks = Similarity.topCellsViaChunks(viaDriver, "vec_id",
      col("u"), trainOnce(), dim, 1, "__c")
      .withColumn("cell_c", col("__c")(0))
    val total = viaChunks.count()
    val agree = viaChunks.filter(col("cell_d") === col("cell_c")).count()
    info(s"driver-vs-distributed assignment agreement: $agree/$total")
    assert(agree.toDouble / total >= 0.9,
      s"only $agree/$total assignments agree — the distributed trainer " +
        "diverged from the driver recipe beyond centroid-ulp noise")
  }

  test("rank-path seeding trains a bit-equal index to the sort-limit path") {
    // seedCells dispatches to GlobalRank past the one-task comfort
    // line (k·dim·8 > chunkBroadcastBytes); forcing that path at
    // fixture k must change NOTHING — same md5 order, same cells,
    // same seeds, therefore the same Lloyd trajectory and a
    // bit-identical chunk relation. A divergence here means the
    // escalated seeding would silently train a different index the
    // moment k crosses the threshold.
    val e = Tables.embeddings(spark, sf)
      .withColumn("vd", expr("transform(embedding, x -> cast(x AS DOUBLE))"))
      .withColumn("nrm", VectorFunctions.l2norm(col("vd")))
      .select(col("vec_id"), col("vd"), col("nrm"))
    val k = 16
    def chunksOf(forceRank: Boolean) =
      Similarity.ivfTrainChunks(e, k, iters = 2, sampleMod = 3, dim,
          chunkSize = 5, forceRankSeeds = forceRank)
        .collect().sortBy(_.getSeq[Long](2).head)
    val small = chunksOf(forceRank = false)
    val rank = chunksOf(forceRank = true)
    assert(small.length === rank.length)
    assert(small.zip(rank).forall { case (a, b) =>
      a.getSeq[Double](0) == b.getSeq[Double](0) &&
        a.getSeq[Double](1) == b.getSeq[Double](1) &&
        a.getSeq[Long](2) == b.getSeq[Long](2)
    }, "rank-seeded training diverged from the sort-limit seeding")
  }

  test("distributed semCells regime is row-exact with the driver regime") {
    // semCells escalates past cellChunkSize cells (k = n/64 → 100 TB
    // wants millions); the escalated spelling must assign every
    // vector the SAME cell as the driver spelling — same seeds, same
    // exact ppm Lloyd step, same argmax — or the SemDeDup funnel's
    // oracle contract silently breaks at the dispatch boundary.
    val e = Tables.embeddings(spark, sf)
      .withColumn("vd", expr("transform(embedding, x -> cast(x AS DOUBLE))"))
      .withColumn("nrm", VectorFunctions.l2norm(col("vd")))
      .select(col("vec_id"), col("vd"), col("nrm"))
    val driver = Similarity.semCells(e)
    val dist = Similarity.semCells(e, forceDistributed = true)
      .withColumnRenamed("cell", "cell_dist")
    assert(driver.count() === dist.count())
    val joined = driver.join(dist, "vec_id")
    assert(joined.filter(!(col("cell") <=> col("cell_dist"))).count() === 0,
      "escalated semCells diverged from the driver regime")
    // multi-cell regime, or the parity is vacuous
    assert(dist.select("cell_dist").distinct().count() > 1)
  }

  test("cell_topn_chunk generated code actually COMPILES (no silent interpreted fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
    val e = graft.functions.CellTopNChunk(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      BoundReference(1, ArrayType(DoubleType), nullable = true),
      BoundReference(2, ArrayType(DoubleType), nullable = true),
      BoundReference(3, ArrayType(LongType), nullable = true), 2, 2)
    val proj = GenerateUnsafeProjection.generate(Seq(e)) // throws on Janino failure
    val row = InternalRow(
      ArrayData.toArrayData(Array(0.6, 0.8)),
      ArrayData.toArrayData(Array(1.0, 0.0, 0.0, 1.0)), // 2 cells x dim 2
      ArrayData.toArrayData(Array(1.0, 1.0)),
      ArrayData.toArrayData(Array(10L, 20L)))
    val out = proj(row).getArray(0)
    // dots 0.6 / 0.8 -> (800000, 20) then (600000, 10)
    assert(out.numElements() === 2)
    assert(out.getStruct(0, 2).getLong(0) === 800000L)
    assert(out.getStruct(0, 2).getLong(1) === 20L)
    assert(out.getStruct(1, 2).getLong(1) === 10L)
    val nul = proj(InternalRow(null,
      ArrayData.toArrayData(Array(1.0, 0.0, 0.0, 1.0)),
      ArrayData.toArrayData(Array(1.0, 1.0)),
      ArrayData.toArrayData(Array(10L, 20L))))
    assert(nul.isNullAt(0))
  }

  test("a malformed chunk throws loudly — never a silent null-drop") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val u = ArrayData.toArrayData(Array(0.6, 0.8))
    // null chunk array
    val e1 = intercept[IllegalArgumentException](
      graft.functions.CellTopNChunk.topn(u, null,
        ArrayData.toArrayData(Array(1.0)), ArrayData.toArrayData(Array(1L)),
        2, 1))
    assert(e1.getMessage.contains("malformed"))
    // inconsistent lengths (3 doubles for dim 2)
    val e2 = intercept[IllegalArgumentException](
      graft.functions.CellTopNChunk.topn(u,
        ArrayData.toArrayData(Array(1.0, 0.0, 0.5)),
        ArrayData.toArrayData(Array(1.0)), ArrayData.toArrayData(Array(1L)),
        2, 1))
    assert(e2.getMessage.contains("inconsistent"))
    // ids not strictly ascending breaks the tie-break contract
    val e3 = intercept[IllegalArgumentException](
      graft.functions.CellTopNChunk.topn(u,
        ArrayData.toArrayData(Array(1.0, 0.0, 0.0, 1.0)),
        ArrayData.toArrayData(Array(1.0, 1.0)),
        ArrayData.toArrayData(Array(20L, 10L)), 2, 2))
    assert(e3.getMessage.contains("ascending"))
    // null ELEMENTS inside chunk arrays: a null norm would unbox to
    // 0.0 and the /0.0 ppm (Long.MaxValue) would silently displace
    // every real cell — must throw, not evaluate
    val e4 = intercept[IllegalArgumentException](
      graft.functions.CellTopNChunk.topn(u,
        ArrayData.toArrayData(Array(1.0, 0.0, 0.0, 1.0)),
        ArrayData.toArrayData(
          Array[java.lang.Double](java.lang.Double.valueOf(1.0), null)),
        ArrayData.toArrayData(Array(10L, 20L)), 2, 2))
    assert(e4.getMessage.contains("null norm/id"))
    val e5 = intercept[IllegalArgumentException](
      graft.functions.CellTopNChunk.topn(u,
        ArrayData.toArrayData(
          Array[java.lang.Double](java.lang.Double.valueOf(1.0), null,
            java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(1.0))),
        ArrayData.toArrayData(Array(1.0, 1.0)),
        ArrayData.toArrayData(Array(10L, 20L)), 2, 2))
    assert(e5.getMessage.contains("null centroid"))
    // an explicit 0.0 (or NaN/negative/infinite) norm is the same
    // garbage-winner path as a null: /0.0 -> Long.MaxValue ppm
    val e6 = intercept[IllegalArgumentException](
      graft.functions.CellTopNChunk.topn(u,
        ArrayData.toArrayData(Array(1.0, 0.0, 0.0, 1.0)),
        ArrayData.toArrayData(Array(1.0, 0.0)),
        ArrayData.toArrayData(Array(10L, 20L)), 2, 2))
    assert(e6.getMessage.contains("non-positive"))
    val e7 = intercept[IllegalArgumentException](
      graft.functions.CellTopNChunk.topn(u,
        ArrayData.toArrayData(Array(1.0, 0.0, 0.0, 1.0)),
        ArrayData.toArrayData(Array(1.0, Double.NaN)),
        ArrayData.toArrayData(Array(10L, 20L)), 2, 2))
    assert(e7.getMessage.contains("non-positive"))
    // a non-normalized VECTOR breaks the packed combine's ±2e6 ppm
    // precondition — ADVICE r13: the wrap was silent (a corrupted
    // global top-n order), unlike every chunk invariant above.
    // |u| = 3 against a unit-norm centroid → ppm = 3e6 > 2e6
    val e8 = intercept[IllegalArgumentException](
      graft.functions.CellTopNChunk.topn(
        ArrayData.toArrayData(Array(1.8, 2.4)),
        ArrayData.toArrayData(Array(0.6, 0.8, 0.0, 1.0)),
        ArrayData.toArrayData(Array(1.0, 1.0)),
        ArrayData.toArrayData(Array(10L, 20L)), 2, 2))
    assert(e8.getMessage.contains("packing"), e8.getMessage)
    // ...and a unit vector (the caller contract) stays comfortably
    // inside the bound on the same chunk
    val ok = graft.functions.CellTopNChunk.topn(u,
      ArrayData.toArrayData(Array(0.6, 0.8, 0.0, 1.0)),
      ArrayData.toArrayData(Array(1.0, 1.0)),
      ArrayData.toArrayData(Array(10L, 20L)), 2, 1)
    assert(ok.numElements() == 1)
  }

  test("the ±2e6 refusal is parity-covered: CellTopN rejects the same non-normalized input") {
    // r14 ADVICE: the chunk kernel refused |ppm| > 2e6 loudly while
    // CellTopN — spec-pinned bit-equal — silently accepted the same
    // out-of-contract vector, so the two paths diverged in failure
    // behavior exactly where inputs are malformed. Both must refuse.
    import org.apache.spark.sql.catalyst.util.ArrayData
    val over = ArrayData.toArrayData(Array(1.8, 2.4)) // |u| = 3 → ppm 3e6
    val e = intercept[IllegalArgumentException](
      graft.functions.CellTopN.topn(over,
        Array(0.6, 0.8, 0.0, 1.0), Array(1.0, 1.0), Array(10L, 20L), 2, 2))
    assert(e.getMessage.contains("2e6"), e.getMessage)
    // the unit vector passes on both paths with the same winner
    val u = ArrayData.toArrayData(Array(0.6, 0.8))
    val viaPlain = graft.functions.CellTopN.topn(u,
      Array(0.6, 0.8, 0.0, 1.0), Array(1.0, 1.0), Array(10L, 20L), 2, 1)
    val viaChunk = graft.functions.CellTopNChunk.topn(u,
      ArrayData.toArrayData(Array(0.6, 0.8, 0.0, 1.0)),
      ArrayData.toArrayData(Array(1.0, 1.0)),
      ArrayData.toArrayData(Array(10L, 20L)), 2, 1)
    assert(viaPlain.getLong(0) === viaChunk.getStruct(0, 2).getLong(1))
  }
}
