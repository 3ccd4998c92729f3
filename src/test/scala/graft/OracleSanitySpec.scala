package graft

/** Static sanity over every registered oracle's SQL text.
  *
  * Scala object vals initialize in declaration order: a query `val`
  * that interpolates a shared CTE def BEFORE the constants that def
  * references are initialized bakes default values (0.0, 0, null)
  * into its oracle string — silently, at class-load time, with no
  * runtime error on either engine (q_ann_ivfpq's first build shipped
  * `ceil(count(*) / 0.0)` this way; DuckDB folded it to NULL and the
  * k-means cell count quietly degenerated to the `greatest` floor).
  * These checks catch the degenerate-interpolation class before an
  * oracle run has to.
  */
class OracleSanitySpec extends SparkSpec {

  test("no oracle contains a divide-by-literal-zero (uninitialized interpolation)") {
    val bad = SparkEntry.oracleSql.filter { case (_, sql) =>
      sql.contains("/ 0.0") || sql.contains("/ 0)") || sql.contains("% 0")
    }
    assert(bad.isEmpty,
      s"degenerate literal arithmetic in oracles: ${bad.keys.mkString(", ")}")
  }

  test("the SRP oracle CASE rungs match srpBitsLadder's exact thresholds") {
    // the ladder lives in two places — Scala (srpBitsLadder) and the
    // generated oracle CASE — and a drift between them would surface
    // only as a hash mismatch at whichever SF crosses the divergent
    // threshold. Pin both sides to the same integers directly.
    import graft.queries.Similarity.{srpBitsLadder, srpNbCaseSql, srpRungs}
    val boundary = Seq(1L -> 5, 800L -> 5, 801L -> 7, 3200L -> 7,
      3201L -> 9, 12800L -> 9, 12801L -> 11, 51200L -> 11,
      51201L -> 13, 204800L -> 13, 204801L -> 15, 819200L -> 15,
      819201L -> 17, 3276800L -> 17, 3276801L -> 19, 13107200L -> 19,
      13107201L -> 21, 52428800L -> 21, 52428801L -> 23,
      209715200L -> 23)
    boundary.foreach { case (n, bits) =>
      assert(srpBitsLadder(n) == bits,
        s"srpBitsLadder($n) = ${srpBitsLadder(n)}, expected $bits")
    }
    // past the last rung the Scala ladder refuses LOUDLY (the old
    // spelling silently stepped past the hand-kept SQL envelope and
    // failed only at the driver's hash compare). The probe derives
    // from the rung list so appending a rung moves it automatically.
    val past = intercept[IllegalArgumentException](
      srpBitsLadder(graft.queries.Similarity.srpRungCap(srpRungs.size - 1) + 1))
    assert(past.getMessage.contains("srpRungs"), past.getMessage)
    // both sides generate from ONE rung list: every SRP consumer's SQL
    // must embed srpNbCaseSql verbatim — a hand-edited CASE that
    // drifts from srpRungs cannot pass this
    assert(srpRungs == Seq(5, 7, 9, 11, 13, 15, 17, 19, 21, 23))
    val srpConsumers = Seq("q_ann_srp", "q_mmr_rerank_ann",
      "q_knn_graph", "q_knn_link_prediction")
    srpConsumers.foreach { q =>
      val sql = SparkEntry.oracleSql(q)
      assert(sql.contains(srpNbCaseSql),
        s"$q oracle lost the generated ladder CASE ($srpNbCaseSql)")
    }
  }

  test("deep-rung SRP pipeline is hash-pinned to its DuckDB-audited result (rungs 9, 11, 13, 15)") {
    // r13 verdict task 2: the driver's oracle gate exercises only
    // rung 5 (sf0.01) and rung 7 (sf0.1); deeper rungs were engaged by
    // unit boundaries alone. These constants were produced by the
    // one-off cross-engine audit tools/audit_srp_rung.py (2026-08-15,
    // DuckDB 1.0.0): the FULL q_ann_srp pipeline — generated ladder
    // CASE, md5-derived plane dots (120 at the r14 audit; 136 since
    // rung 17), weakest-bit multi-probe,
    // exact-cosine rerank — ran on both engines over the
    // bit-reproducible SyntheticEmbeddings corpus and matched
    // row-exactly at n=4,000 (rung 9) and n=16,000 (rung 11). The
    // suite re-derives the Spark side and pins it to that audited
    // value, so any later drift in ladder/bucket/rerank arithmetic at
    // deep rungs fails HERE, not at a future driver hash-compare.
    // Rung 13 (n=60,000 — PAST the old 51,200 envelope, through the
    // r14-appended rung) matched row-exactly too; the audit needed a
    // DuckDB spill path (the 16-way OR collision join plans as a
    // nested loop there — 3.6B pairings at 60k, OOM without
    // temp_directory; the script sets it).
    // Rung 15 (n=240,000, r15 — audited 2026-08-16 alongside the rung
    // 17 ladder append): row-exact too; DuckDB needed 27 min for the
    // 5.76e10 nested-loop pairings plus memory_limit BELOW the box
    // (40GB — spill early instead of an Allocation failure) and
    // preserve_insertion_order=false. Each deeper rung costs 16× that,
    // so rung 15 is the audit depth by construction; rung 17's
    // engagement evidence is ScalingCurveSpec's measured 1.024M point.
    import graft.queries.Similarity.srpBitsLadder
    val pinned = Seq(
      (4000L, 9, "7b5db01657182b2f6c7eb9886825d0d6"),
      (16000L, 11, "aae3f7d4b684a10b70012a59a57f858c"),
      (60000L, 13, "9d7946096e50fb616426a7cefa3784bc"),
      (240000L, 15, "4c23751b92cbb91894b4955e76a3d3c2"))
    pinned.foreach { case (n, rung, expected) =>
      assert(srpBitsLadder(n) == rung)
      val dir = java.nio.file.Files.createTempDirectory(s"srp_pin_$n").toString
      try {
        SyntheticEmbeddings.write(spark, n, dir)
        val got = SyntheticEmbeddings.canonicalHash(
          SparkEntry.queries("q_ann_srp")(spark, dir))
        assert(got == expected,
          s"q_ann_srp @ n=$n (rung $rung): canonical hash $got drifted from " +
            s"the DuckDB-audited $expected — deep-rung SRP arithmetic changed")
      } finally SyntheticEmbeddings.rm(dir)
    }
  }

  test("every oracle ORDER BY key states NULLS FIRST/LAST explicitly (engine defaults differ)") {
    // the r15 fleet-wide latent class: Spark orders NULLS FIRST on ASC
    // and NULLS LAST on DESC; DuckDB defaults to the OPPOSITE on both.
    // The fixtures contain zero nulls, so an implicit-placement oracle
    // is hash-green today and diverges on the first null-bearing
    // corpus. All 96 clauses were made explicit in r15 (matching
    // Spark's defaults); this audit keeps every FUTURE oracle honest.
    def clauseEnd(s: String, start: Int): Int = {
      var depth = 0
      var i = start
      while (i < s.length) {
        val ch = s(i)
        if ("({[".contains(ch)) depth += 1
        else if (")}]".contains(ch)) {
          if (depth == 0) return i
          depth -= 1
        }
        if (depth == 0 && ch == '"') return i
        if (depth == 0 && i > 0 && " \t\n".contains(s(i - 1)) &&
            Seq("ROWS", "RANGE", "LIMIT").exists(t =>
              s.startsWith(t + " ", i) || s.startsWith(t + "\n", i)))
          return i
        i += 1
      }
      s.length
    }
    def splitKeys(s: String): Seq[String] = {
      val keys = scala.collection.mutable.Buffer.empty[String]
      val cur = new StringBuilder
      var depth = 0
      s.foreach { ch =>
        if ("({[".contains(ch)) depth += 1
        else if (")}]".contains(ch)) depth -= 1
        if (ch == ',' && depth == 0) { keys += cur.toString; cur.clear() }
        else cur += ch
      }
      if (cur.nonEmpty) keys += cur.toString
      keys.toSeq
    }
    val bad = scala.collection.mutable.Buffer.empty[String]
    for ((name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      var from = 0
      while ({ val i = sql.indexOf("ORDER BY ", from); from = i; i >= 0 }) {
        val start = from + "ORDER BY ".length
        val end = clauseEnd(sql, start)
        splitKeys(sql.substring(start, end)).foreach { k =>
          val key = k.trim
          if (key.nonEmpty &&
              !key.toUpperCase.matches("(?s).*NULLS\\s+(FIRST|LAST)$"))
            bad += s"$name: ORDER BY key '$key' has implicit null placement"
        }
        from = end
      }
    }
    assert(bad.isEmpty,
      "oracle ORDER BY keys without explicit NULLS FIRST/LAST (Spark: " +
        "asc=FIRST desc=LAST; DuckDB defaults are the opposite — state " +
        s"Spark's): ${bad.take(10).mkString("; ")}")
  }

  test("no oracle interpolated a lowercase 'null' token (uninitialized String val)") {
    // intended SQL nulls in this codebase are uppercase (IS NULL,
    // IFNULL); a lowercase bare `null` is Scala's uninitialized
    // String rendered into the interpolation
    val word = "(?<![A-Za-z_])null(?![A-Za-z_])".r
    val bad = SparkEntry.oracleSql.filter { case (_, sql) =>
      word.findFirstIn(sql).isDefined
    }
    assert(bad.isEmpty, s"lowercase null token in: ${bad.keys.mkString(", ")}")
  }
}
