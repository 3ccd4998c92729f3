package graft

import org.apache.spark.sql.functions._
import graft.queries.{Analytics, Curation, Similarity, TextOps}

/** Invariant tests for the round-9 governance/modeling additions —
  * properties the DuckDB hash oracle cannot express (cross-query
  * consistency, mathematical bounds).
  */
class GovernanceSpec extends SparkSpec {

  test("q_bpe_apply: compression never exceeds 1 token/char and " +
       "re-tokenized char mass equals the corpus char mass") {
    val rows = TextOps.bpeApply.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nChars = r.getAs[Long]("n_chars")
      val nToks = r.getAs[Long]("n_tokens")
      val nWords = r.getAs[Long]("n_words")
      // each token holds >= 1 char, each word >= 1 token
      assert(nToks <= nChars, s"more tokens than chars: $r")
      assert(nWords <= nToks, s"more words than tokens: $r")
      assert(r.getAs[Long]("compression_ppm") <= 1000000L)
    }
    // the vocab join must lose no corpus word: total words here ==
    // corpus [a-z]+ token occurrences counted directly
    val direct = graft.model.Tables.documents(spark, sf)
      .select(explode(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("w"))
      .count()
    assert(rows.map(_.getAs[Long]("n_words")).sum === direct)
  }

  test("q_bigram_surprisal: bits are non-negative and bounded by " +
       "n_bigrams * corpus log2-range") {
    val rows = TextOps.bigramSurprisal.fn(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val bits = r.getAs[Long]("bits")
      val nb = r.getAs[Long]("n_bigrams")
      assert(bits >= 0L, s"negative surprisal (cb > cu?): $r")
      assert(bits <= nb * 63L)
      assert(r.getAs[Long]("mean_bits_ppm") === bits * 1000000L / nb)
    }
    // ranked output: mean descending, doc_id tiebreak ascending
    val means = rows.map(r => (-r.getAs[Long]("mean_bits_ppm"), r.getAs[Long]("doc_id")))
    assert(means.sameElements(means.sorted))
  }

  test("q_mad_outliers: MAD-based outliers are a subset of the type " +
       "population and med/mad are actual data points") {
    val rows = Analytics.madOutliers.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (k, vs) => k -> vs.map(_.getDouble(1)) }
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val vals = ev(t)
      assert(r.getAs[Long]("n") === vals.length.toLong)
      val med = r.getAs[Double]("med")
      assert(vals.contains(med), s"median is not a data point: $r")
      val mad = r.getAs[Double]("mad")
      assert(vals.exists(v => math.abs(v - med) == mad),
        s"MAD is not an observed deviation: $r")
      val nOut = vals.count(v => math.abs(v - med) > 6.0 * mad)
      assert(r.getAs[Long]("n_outliers") === nOut.toLong)
    }
  }

  test("q_knn_graph: histogram masses are consistent and bounded by k") {
    val rows = Similarity.knnGraph.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val deg = r.getAs[Long]("degree")
      assert(deg >= 1L && deg <= 4L,
        s"mutual degree outside [1, k=4]: $r")
    }
    // sum(degree * n_nodes) = 2 * |edges| (handshake): even
    val mass = rows.map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_nodes")).sum
    assert(mass % 2 === 0L, s"odd edge-endpoint mass $mass")
  }

  test("q_knn_link_prediction: predictions are non-edges with bounded scores") {
    val rows = Similarity.knnLinkPrediction.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
      val nc = r.getAs[Long]("n_common")
      val ra = r.getAs[Long]("ra_ppm")
      assert(a < b, "pair not canonical")
      // mutual-kNN degree is ≤ k=4, so common-neighbor count is too
      assert(nc >= 1L && nc <= 4L, s"n_common out of [1,4]: $r")
      // every common neighbor touches both endpoints, so its degree is
      // in [2, 4] -> each RA term is in [250000, 500000] ppm
      assert(ra >= nc * 250000L && ra <= nc * 500000L,
        s"ra_ppm inconsistent with $nc common neighbors: $r")
    }
  }

  test("q_epoch_shuffle: per-epoch assignment is uniform-ish, complete " +
       "and differs across epochs") {
    val rows = TextOps.epochShuffle.fn(spark, sf).collect()
    val total = graft.model.Tables.documents(spark, sf).count()
    Seq(0L, 1L).foreach { e =>
      val er = rows.filter(_.getAs[Long]("epoch") == e)
      assert(er.length === 16, s"epoch $e has ${er.length} buckets")
      val counts = er.map(_.getAs[Long]("n_docs"))
      assert(counts.sum === total)
      // md5 uniformity: no bucket more than 3x the mean (loose, but a
      // broken hash or a modulo bias fails it immediately)
      assert(counts.max <= 3 * (total / 16).max(1),
        s"epoch $e skewed: ${counts.toSeq}")
    }
    // different epochs really are different orders: the per-bucket
    // lead hashes cannot all coincide
    val lead = rows.groupBy(_.getAs[Long]("epoch"))
      .map { case (e, rs) =>
        e -> rs.sortBy(_.getAs[Long]("bucket")).map(_.getAs[Long]("min_h")).toSeq }
    assert(lead(0L) != lead(1L), "epoch 0 and 1 produced identical orders")
  }

  test("q_dataset_card: volumes reconcile with the raw corpus") {
    val rows = Curation.datasetCard.fn(spark, sf).collect()
    val d = graft.model.Tables.documents(spark, sf)
    val total = d.count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    val totalChars = d.agg(sum(col("n_chars"))).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n_chars")).sum === totalChars)
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("quality_pass") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_langs") >= 1L)
    }
  }

  test("q_table_fingerprint: order-independent, byte-sensitive, count-faithful") {
    import graft.queries.Layout
    def fp(rows: Seq[String]) = {
      import spark.implicits._
      Layout.fingerprintOf(
        rows.toDF("s").repartition(4), "t", col("s")).collect()(0)
    }
    val base = (1 to 100).map(i => s"row|$i|payload")
    val a = fp(base)
    // row order and physical partitioning must not matter
    assert(a == fp(scala.util.Random.shuffle(base)))
    // one flipped byte in one row must move the checksum
    val b = fp(base.updated(42, "row|43|paylNad"))
    assert(a.getAs[Long]("hash_checksum") != b.getAs[Long]("hash_checksum"))
    assert(a.getAs[Long]("n_rows") === 100L)
    // and the registered query's fingerprint reconciles with count(*)
    val reg = Layout.tableFingerprint.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reg("documents") ===
      graft.model.Tables.documents(spark, sf).count())
    assert(reg("orders") === graft.model.Tables.orders(spark, sf).count())
  }
}
