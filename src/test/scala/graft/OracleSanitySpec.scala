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
      3201L -> 9, 12800L -> 9, 12801L -> 11, 51200L -> 11)
    boundary.foreach { case (n, bits) =>
      assert(srpBitsLadder(n) == bits,
        s"srpBitsLadder($n) = ${srpBitsLadder(n)}, expected $bits")
    }
    // past the last rung the Scala ladder refuses LOUDLY (the old
    // spelling silently stepped past the hand-kept SQL envelope and
    // failed only at the driver's hash compare)
    val past = intercept[IllegalArgumentException](srpBitsLadder(51201L))
    assert(past.getMessage.contains("srpRungs"), past.getMessage)
    // both sides generate from ONE rung list: every SRP consumer's SQL
    // must embed srpNbCaseSql verbatim — a hand-edited CASE that
    // drifts from srpRungs cannot pass this
    assert(srpRungs == Seq(5, 7, 9, 11))
    val srpConsumers = Seq("q_ann_srp", "q_mmr_rerank_ann",
      "q_knn_graph", "q_knn_link_prediction")
    srpConsumers.foreach { q =>
      val sql = SparkEntry.oracleSql(q)
      assert(sql.contains(srpNbCaseSql),
        s"$q oracle lost the generated ladder CASE ($srpNbCaseSql)")
    }
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
