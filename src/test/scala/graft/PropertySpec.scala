package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.ProductViewPipeline

/** Property-based invariants (SURVEY.md §5.2): window-count mass
  * conservation, epoch-aligned bucket assignment, and distinct-count
  * orderings, over generated event sets. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Seeded forAll over scalacheck Gen (no scalatestplus bridge in
    * the offline dep set): 20 deterministic samples per property. A
    * generator that produces no samples (e.g. an over-narrow suchThat
    * added later) fails the property instead of passing it vacuously. */
  private def forAll[A](gen: Gen[A], n: Int = 20)(f: A => Unit): Unit = {
    var ran = 0
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach { a =>
        ran += 1; f(a)
      }
    }
    assert(ran > 0, s"generator produced 0 of $n samples — vacuous property")
  }

  private val eventGen: Gen[(String, Long)] = for {
    src <- Gen.oneOf("desktop", "mobile-web", "mobile-app")
    // timestamps across ~3 hours with second resolution
    off <- Gen.choose(0L, 3L * 3600)
  } yield (src, 1615000000L + off)

  private val eventsGen = Gen.nonEmptyListOf(eventGen)

  test("sum of per-window counts equals the number of events (mass conservation)") {
    forAll(eventsGen) { evs =>
      val df = evs.map { case (s, sec) => (s, new Timestamp(sec * 1000)) }
        .toDF("source", "timestamp")
      val counts = ProductViewPipeline.windowedCounts(df)
      val total = counts.agg(sum("source_number")).head().getLong(0)
      assert(total === evs.size.toLong)
    }
  }

  test("window assignment is floor(epoch / 300) * 300, start-inclusive end-exclusive") {
    forAll(eventsGen) { evs =>
      val df = evs.map { case (s, sec) => (s, new Timestamp(sec * 1000)) }
        .toDF("source", "timestamp")
      val withW = df.select(col("timestamp"),
        window(col("timestamp"), "5 minutes").as("w"))
      val bad = withW.filter(
        col("w.start").cast("long") =!= (col("timestamp").cast("long") / 300).cast("long") * 300 ||
        col("timestamp") < col("w.start") || col("timestamp") >= col("w.end"))
      assert(bad.count() === 0)
    }
  }

  test("count >= exact distinct users; approx distinct is within 3*rsd of exact") {
    forAll(Gen.nonEmptyListOf(Gen.choose(1, 500))) { userIds =>
      val df = userIds.map(u => ("desktop", s"user-$u")).toDF("source", "userid")
      val row = df.agg(
        count(lit(1)).as("n"),
        countDistinct(col("userid")).as("exact"),
        approx_count_distinct(col("userid"), 0.05).as("approx")).head()
      val (n, exact, approx) = (row.getLong(0), row.getLong(1), row.getLong(2))
      assert(n >= exact)
      assert(math.abs(approx - exact).toDouble <= math.max(3 * 0.05 * exact, 3.0),
        s"approx=$approx exact=$exact")
    }
  }

  test("AsOfJoin equals the naive greatest-match theta join on random data") {
    import graft.operators.AsOfJoin
    val pairGen = for {
      k <- Gen.choose(1, 5)
      t <- Gen.choose(0L, 1000L)
    } yield (k, t)
    val casesGen = for {
      lefts <- Gen.nonEmptyListOf(pairGen)
      rights <- Gen.nonEmptyListOf(pairGen)
    } yield (lefts, rights.distinct) // right unique per (key,time)
    forAll(casesGen, n = 10) { case (lefts, rights) =>
      val l = lefts.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new Timestamp(t * 1000)) }
        .toDF("lid", "k", "lt")
      val r = rights.map { case (k, t) => (k, new Timestamp(t * 1000), s"v$k-$t") }
        .toDF("rk", "rt", "payload")
      val got = AsOfJoin.backward(l, r, "k", "lt", "rk", "rt", Seq("rt", "payload"))
        .select("lid", "payload").collect().map(x => x.getLong(0) -> x.getString(1)).toMap
      // naive: for each left row, right row with max rt <= lt on same key
      val want = lefts.zipWithIndex.flatMap { case ((k, t), i) =>
        val matches = rights.filter { case (rk, rt) => rk == k && rt <= t }
        if (matches.isEmpty) None
        else {
          val (mk, mt) = matches.maxBy(_._2)
          Some(i.toLong -> s"v$mk-$mt")
        }
      }.toMap
      assert(got === want)
    }
  }

  test("RangeJoin equals the naive theta join on random timestamps (incl. bucket boundaries)") {
    val tsGen = Gen.choose(0L, 7200L) // 2h span, 600s buckets -> many boundary hits
    forAll(Gen.zip(Gen.nonEmptyListOf(tsGen), Gen.nonEmptyListOf(tsGen)), n = 10) {
      case (ls, rs) =>
        val left = ls.zipWithIndex
          .map { case (s, i) => (i.toLong, new Timestamp(1615000000000L + s * 1000)) }
          .toDF("l_id", "l_ts")
        val right = rs.zipWithIndex
          .map { case (s, i) => (i.toLong, new Timestamp(1615000000000L + s * 1000)) }
          .toDF("r_id", "r_ts")
        val got = graft.operators.RangeJoin.preceding(left, right, "l_ts", "r_ts", 600L)
          .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = left.join(right,
            col("r_ts") >= col("l_ts") - expr("INTERVAL 600 SECONDS") &&
            col("r_ts") < col("l_ts"))
          .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == want, s"range join mismatch: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("Money.cents matches BigDecimal HALF_UP at 2dp and is engine-order independent") {
    // the integer-cents convention every money output relies on:
    // floor(x*100 + 0.5) must equal the half-up rounding of the decimal
    // value x represents, for the money magnitudes in the testdata
    val moneyGen = for {
      units <- Gen.choose(-99999L, 999999L)
      hundredths <- Gen.choose(0L, 99L)
    } yield units + hundredths / 100.0
    forAll(Gen.nonEmptyListOf(moneyGen), n = 10) { xs =>
      val df = xs.toDF("x")
      val got = df.select(graft.model.Money.cents(col("x")).as("c"))
        .collect().map(_.getLong(0)).toSeq
      val want = xs.map(x =>
        java.math.BigDecimal.valueOf(x)
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact())
      assert(got == want, s"cents mismatch for $xs")
      // association-order independence of the BIGINT sum
      val s1 = df.repartition(7).select(sum(graft.model.Money.cents(col("x"))))
        .head().getLong(0)
      assert(s1 == want.sum)
    }
  }

  test("dropDuplicates is idempotent and bounded by distinct key count") {
    forAll(Gen.nonEmptyListOf(Gen.choose(1, 50))) { ids =>
      val df = ids.map(i => (i, s"payload-$i")).toDF("id", "payload")
      val once = df.dropDuplicates("id")
      val twice = once.dropDuplicates("id")
      assert(once.count() === ids.distinct.size.toLong)
      assert(twice.count() === once.count())
    }
  }

  test("interval-union coverage fold equals brute-force window union") {
    // the q_exact_substring core: fold sorted window starts through
    // the (cov, last) accumulator == |union of [p, p+W)| for any
    // position multiset
    val W = 8
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 60))) { rawPs =>
      val ps = rawPs.distinct.sorted.map(_.toLong)
      val df = Seq(Tuple1(ps)).toDF("ps")
        .select(expr(
          s"""aggregate(ps,
                named_struct('cov', cast(0 AS bigint), 'last', cast(-1 AS bigint)),
                (a, p) -> named_struct(
                  'cov', a.cov + greatest(cast(p AS bigint) + $W
                                          - greatest(cast(p AS bigint), a.last),
                                          cast(0 AS bigint)),
                  'last', greatest(a.last, cast(p AS bigint) + $W)),
                a -> a.cov)""").as("covered"))
      val expected = ps.flatMap(p => p until p + W).distinct.size.toLong
      assert(df.head().getLong(0) === expected, s"positions $ps")
    }
  }

  test("stratified sampler yields exactly min(cap, |stratum|) rows under adversarial skew") {
    // the q_stratified_sample shape (TextOps.scala): bounded-heap TopK
    // per stratum — driven here over adversarially skewed strata (one
    // 2000-row giant next to a 1-row singleton, web-corpus style) and
    // heavily tied sample keys (h = id % 3) so the (h DESC, id ASC)
    // tie-break, not luck, decides membership
    val cap = 7
    val topk = udaf(new graft.functions.Aggregators.TopK(cap))
    val sizes = Seq("giant" -> 2000, "exact" -> cap, "under" -> (cap - 1),
      "over" -> (cap + 1), "one" -> 1)
    val data = sizes.flatMap { case (g, n) =>
      (0 until n).map(i => (g, (i % 3).toLong, i.toLong))
    }
    val out = data.toDF("g", "h", "id").repartition(13)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_total"), topk(col("h"), col("id")).as("top"))
      .select(col("g"), col("n_total"), col("top.items").as("items"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        r.getSeq[org.apache.spark.sql.Row](2).map(x => (x.getLong(0), x.getLong(1))))))
      .toMap
    sizes.foreach { case (g, n) =>
      val (nTotal, items) = out(g)
      assert(nTotal == n.toLong, s"stratum $g total")
      assert(items.size == math.min(cap, n), s"stratum $g: exact-size contract")
      val expected = (0 until n).map(i => ((i % 3).toLong, i.toLong))
        .sortBy { case (h, id) => (-h, id) }.take(cap)
      assert(items == expected, s"stratum $g: deterministic (h DESC, id ASC) membership")
    }
  }

  test("vocab coverage equals the naive per-lang window computation") {
    // the distributed PrefixSum path (q_vocab_coverage) must agree
    // exactly with the single-reducer window formulation it replaces
    val out = graft.queries.TextOps.vocabCoverage.fn(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val f = graft.model.Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(desc("freq"), asc("tok"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val naive = f
      .withColumn("excl", coalesce(sum(col("freq")).over(w), lit(0L)))
      .withColumn("total", sum(col("freq")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("vocab_size"), max(col("total")).as("total_tokens"),
           sum(when(col("excl") * 2 < col("total"), 1L).otherwise(0L)).as("n_cover_50"),
           sum(when(col("excl") * 10 < col("total") * 9, 1L).otherwise(0L)).as("n_cover_90"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out == naive, s"prefix-sum path $out != window path $naive")
    // the nucleus is never empty and never exceeds the vocabulary
    out.foreach { case (lang, (vocab, _, c50, c90)) =>
      assert(c50 >= 1L && c50 <= c90 && c90 <= vocab, s"$lang: 1 <= c50 <= c90 <= vocab")
    }
  }

  test("collocation lift matches hand computation and ranks like PMI") {
    val dir = java.nio.file.Files.createTempDirectory("graft-colloc")
      .toFile.getAbsolutePath
    // tokens: x y x y x y x y x y -> bigrams (x,y)=5, (y,x)=4
    // unigrams x=5, y=5; N_uni=10, N_bi=9
    // lift(x,y) = 5*10*10/(9*5*5) = 500/225 = 2.2222... -> 2222222 ppm
    spark.createDataFrame(Seq((0L, "en", Seq.fill(5)("x y").mkString(" "))))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextOps.collocations.fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("x", "y", 5L, 2222222L)),
      s"unexpected collocations: ${out.toSeq}")
  }

  test("chunk overlap layout matches hand computation at the window boundaries") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chunk")
      .toFile.getAbsolutePath
    def toks(n: Int) = (0 until n).map(i => s"t$i").mkString(" ")
    spark.createDataFrame(Seq(
      (0L, "a", toks(256)),  // exactly one window: k=1, overlap 0
      (1L, "b", toks(257)),  // one past the boundary: k=2, overlap 64
      (2L, "c", toks(500)),  // k = 1 + ceil(244/192) = 3, overlap 128
      (3L, "d", toks(448)))) // n = C + S exactly: k=2, overlap 64
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextOps.chunkOverlap.fn(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") == ((256L, 1L, 0L)), s"a: ${out("a")}")
    assert(out("b") == ((257L, 2L, 64L)), s"b: ${out("b")}")
    assert(out("c") == ((500L, 3L, 128L)), s"c: ${out("c")}")
    assert(out("d") == ((448L, 2L, 64L)), s"d: ${out("d")}")
  }

  test("temperature mix: sqrt weights compress the share gap, exact at planted ratios") {
    val dir = java.nio.file.Files.createTempDirectory("graft-temp")
      .toFile.getAbsolutePath
    // 64 en + 36 fr of 100: p = 0.64 / 0.36, sqrt = 0.8 / 0.6 exactly
    spark.createDataFrame(
      (0 until 64).map(i => (i.toLong, "en", "x")) ++
      (0 until 36).map(i => (100L + i, "fr", "x")))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextOps.temperatureMix.fn(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("en") == ((64L, 640000L, 800000L)), s"en: ${out("en")}")
    assert(out("fr") == ((36L, 360000L, 600000L)), s"fr: ${out("fr")}")
    // the whole point: sqrt narrows the ratio (0.8/0.6 < 0.64/0.36)
    assert(out("en")._3.toDouble / out("fr")._3 < out("en")._2.toDouble / out("fr")._2)
  }

  test("bm25 ranks term-bearing docs above term-free docs, rare terms above common") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25")
      .toFile.getAbsolutePath
    def filler(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    spark.createDataFrame(Seq(
      (0L, "en", "spark stream join " + filler("a", 7)),   // all 3 terms
      (1L, "en", "spark " + filler("b", 9)),               // 1 common term
      (2L, "en", filler("c", 10)),                          // no terms -> 0
      (3L, "en", "join " + filler("d", 9))))                // 1 rarer term (df same here)
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextOps.bm25.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(0L) > out(1L) && out(0L) > out(3L),
      s"doc with all terms must rank first: $out")
    assert(out(2L) == 0L, s"term-free doc must score exactly 0: $out")
    assert(out(1L) > 0L && out(3L) > 0L, s"single-term docs must score > 0: $out")
  }

  test("upsert merge conserves mass: |merged| = |base| - |deletes| + |inserts|") {
    val base = graft.model.Tables.orders(spark, sf)
    val nBase = base.count()
    val m10 = pmod(col("o_orderkey"), lit(10))
    val nDel = base.filter(m10 === 7).count()
    val nIns = base.filter(m10 === 1).count()
    val merged = graft.queries.Relational.upsertSnapshot.fn(spark, sf)
    assert(merged.count() === nBase - nDel + nIns)
    // no tombstoned key survives; every updated key carries the new payload
    assert(merged.filter(pmod(col("o_orderkey"), lit(10)) === 7).count() === 0)
    val badUpd = merged
      .filter(pmod(col("o_orderkey"), lit(10)) === 3 &&
        col("o_orderkey") < 1000000000L && col("status") =!= "U").count()
    assert(badUpd === 0, "an updated key kept its stale payload")
  }

  test("funnel histogram partitions the user population") {
    val hist = graft.queries.Analytics.funnelStages.fn(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val users = graft.model.Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(hist.values.sum === users,
      s"stages ${hist} must partition all $users users")
    assert(hist.keySet.subsetOf(Set(0, 1, 2, 3)))
  }

  test("containment dominates Jaccard: every capped-Jaccard pair at >= 0.6 appears in containment") {
    // shared/min(na,nb) >= shared/(na+nb-shared) pointwise, so the
    // j >= 0.6 subset of the df-capped pair set must be a subset of
    // the containment >= 0.6 pair set (identical index, identical cap)
    val jac = graft.queries.Dedup.ngramJaccardCapped.fn(spark, sf)
      .filter(col("jaccard") >= 600000L)
      .select("doc_a", "doc_b")
    val cont = graft.queries.Dedup.containment.fn(spark, sf)
      .select("doc_a", "doc_b")
    val missing = jac.except(cont).count()
    assert(missing === 0,
      s"$missing high-Jaccard pairs missing from the containment pair set")
  }

  test("TopK aggregator equals sort-take regardless of grouping order") {
    val topk = udaf(new graft.functions.Aggregators.TopK(3))
    forAll(Gen.nonEmptyListOf(
        Gen.zip(Gen.choose(1, 5), Gen.choose(-100L, 100L))), n = 10) { rows =>
      // unique tiebreak ids so expected order is total
      val data = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      val out = data.toDF("g", "v", "id").repartition(7)
        .groupBy(col("g")).agg(topk(col("v"), col("id")).as("t"))
        .select(col("g"), explode(col("t.items")).as("item"))
        .select(col("g"), col("item._1").as("v"), col("item._2").as("id"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq.sorted).toMap
      val expected = data.groupBy(_._1).view.mapValues(
        _.map(t => (t._2, t._3)).sortBy { case (v, id) => (-v, id) }
          .take(3).sorted.toSeq).toMap
      assert(out === expected)
    }
  }

  test("BPE merge fold equals reference greedy left-to-right on random words (incl. overlaps)") {
    import spark.implicits._
    // the exact expr q_bpe_train applies each round, parameterized on
    // literal pa/pb so the property drives it standalone
    def sparkMerge(words: Seq[String], pa: String, pb: String): Seq[Seq[String]] = {
      words.toDF("w")
        .select(expr("filter(split(w, ''), c -> c <> '')").as("toks"))
        .select(expr(
          s"""aggregate(toks, cast(array() AS array<string>),
               (acc, x) -> CASE
                 WHEN size(acc) > 0 AND element_at(acc, -1) = '$pa' AND x = '$pb'
                 THEN concat(slice(acc, 1, size(acc) - 1), array(concat('$pa', '$pb')))
                 ELSE concat(acc, array(x)) END)""").as("m"))
        .collect().map(_.getSeq[String](0).toSeq).toSeq
    }
    def refMerge(w: String, pa: String, pb: String): Seq[String] =
      w.map(_.toString).foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == pa && x == pb)
          acc.init :+ (pa + pb)
        else acc :+ x
      }
    // adversarial fixed cases: self-pair overlap runs + no-op merges
    val fixed = Seq("aaa", "aaaa", "abab", "aab", "a", "bb")
    assert(sparkMerge(fixed, "a", "a") == fixed.map(refMerge(_, "a", "a")))
    assert(sparkMerge(fixed, "a", "b") == fixed.map(refMerge(_, "a", "b")))
    forAll(Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)), n = 5) { ws =>
      assert(sparkMerge(ws, "a", "b") == ws.map(refMerge(_, "a", "b")))
      assert(sparkMerge(ws, "b", "b") == ws.map(refMerge(_, "b", "b")))
    }
  }

  test("prefix filtering (q_dedup_prefix_filter) is COMPLETE: every J>=0.5 pair survives prefix + positional filters") {
    // pure-Scala mirror of the Spark plan's FULL candidate rule —
    // prefix membership (`prefixLen = n div 2 + 1`) AND the PPJoin
    // positional bound `3 * (min(na-pa, nb-pb) + 1) >= na + nb` under
    // the global (df asc, token asc) order — checked against
    // brute-force Jaccard on random universes: the composed filters
    // must never lose a qualifying pair, independent of the documents
    // fixture (the 3-SF oracle checks only that corpus). The proof
    // obligation is the first-common-element argument: at the pair's
    // first shared token every other shared token ranks later in BOTH
    // rings, so the positional bound holds there even when it prunes
    // the same pair's later collisions.
    val setsGen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.choose(0, 24)).map(_.toSet))
    forAll(setsGen, n = 40) { sets =>
      val docs = sets.toVector
      val df = docs.flatten.groupBy(identity).view.mapValues(_.size).toMap
      def ring(s: Set[Int]): Vector[Int] =
        s.toVector.sortBy(t => (df(t), t))
      for (i <- docs.indices; j <- docs.indices if i < j) {
        val (a, b) = (docs(i), docs(j))
        val shared = (a & b).size
        if (2 * shared >= a.size + b.size - shared) { // J >= 0.5 exact
          val (ra, rb) = (ring(a), ring(b))
          val (na, nb) = (a.size, b.size)
          val pa = ra.zipWithIndex.toMap // 0-based; +1 below
          val pb = rb.zipWithIndex.toMap
          val hit = (a & b).exists { t =>
            pa(t) + 1 <= na / 2 + 1 && pb(t) + 1 <= nb / 2 + 1 &&
            (math.min(na - (pa(t) + 1), nb - (pb(t) + 1)) + 1) * 3 >= na + nb
          }
          assert(hit,
            s"prefix/positional filter lost a J>=0.5 pair: $a vs $b (df=$df)")
        }
      }
    }
  }

  test("WinnowFps kernel equals the interpreted HOF on random texts (fuzz)") {
    // beyond WinnowFpsSpec's fixture + crafted cases: random word
    // counts (straddling the k=4 / w=4 thresholds), random word
    // lengths/alphabets (incl. multi-byte), random space runs
    val wordGen = for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.frequency(
        8 -> Gen.alphaNumChar, 2 -> Gen.oneOf('!', 'é', 'ß', '中', '.')))
    } yield cs.mkString
    val textGen = for {
      nw <- Gen.choose(0, 14)
      ws <- Gen.listOfN(nw, wordGen)
      seps <- Gen.listOfN(math.max(nw - 1, 0), Gen.oneOf(" ", "  ", "   "))
      lead <- Gen.oneOf("", " ")
    } yield lead + (if (ws.isEmpty) "" else
      ws.head + seps.zip(ws.tail).map { case (s, w) => s + w }.mkString)
    forAll(Gen.listOfN(25, textGen), n = 8) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def canon(v: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
        v(df).select(col("doc_id"), col("w.n_grams"), col("w.n_fingerprints"),
            col("w.fp_min"), col("w.fp_sum"), col("w.fps"))
          .collect().map(r => r.getLong(0) -> r.mkString("|")).toMap
      val k = canon(graft.queries.TextOps.winnowFromText)
      val h = canon(graft.queries.TextOps.winnowFromTextHof)
      val bad = k.collect { case (id, v) if h(id) != v => (texts(id.toInt), v, h(id)) }
      assert(bad.isEmpty, s"kernel != HOF on ${bad.take(2)}")
    }
  }
}
