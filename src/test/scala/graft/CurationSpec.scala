package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.Curation
import graft.model.Tables

/** Planted-fixture tests for the corpus-curation operators: each
  * Gopher rule is violated by exactly one crafted document, repetition
  * and rarity are checked against hand-computed values, and the Bloom
  * decontamination must equal the exact (no-Bloom) computation — the
  * filter is a cost lever, never a result changer.
  */
class CurationSpec extends SparkSpec {

  /** Write a documents.parquet fixture and return its directory. */
  private def fixtureDir(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("graft-curation").toFile.getAbsolutePath
    val df = spark.createDataFrame(rows).toDF("doc_id", "lang", "text")
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("gopher rules: each planted violation fails exactly its rule") {
    // 60 distinct 4-6 char words incl. 2 stopword kinds -> passes all
    def goodText(prefix: String): String =
      ("the" +: "and" +: (0 until 58).map(i => f"${prefix}word$i%02d")).mkString(" ")
    val dir = fixtureDir(Seq(
      (0L, "keep", goodText("k")),
      // 10 tokens only -> fails word count
      (1L, "shrt", ("the" +: "and" +: (0 until 8).map(i => s"word$i")).mkString(" ")),
      // 60 distinct 2-char tokens + stops -> mean word length < 3
      (2L, "tiny", ("the" +: "and" +: (0 until 58).map(i => f"${('a' + i / 26).toChar}${('a' + i % 26).toChar}")).mkString(" ")),
      // 60 distinct words, no stopwords -> fails stopword rule
      (3L, "nost", (0 until 60).map(i => f"zword$i%02d").mkString(" ")),
      // one word 58 times + stops -> duplicate fraction ~0.95
      (4L, "dupl", ("the" +: "and" +: Seq.fill(58)("repeat")).mkString(" "))))
    val rows = Curation.gopherRules.fn(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    def flags(lang: String): (Long, Long, Long, Long, Long) = {
      val r = rows(lang)
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    }
    assert(flags("keep") == ((1L, 1L, 1L, 1L, 1L)), "good doc must pass everything")
    assert(flags("shrt") == ((0L, 1L, 1L, 1L, 0L)), "short doc fails only word count")
    assert(flags("tiny") == ((1L, 0L, 1L, 1L, 0L)), "2-char doc fails only word length")
    assert(flags("nost") == ((1L, 1L, 0L, 1L, 0L)), "stopword-free doc fails only stopwords")
    assert(flags("dupl") == ((1L, 1L, 1L, 0L, 0L)), "repeated doc fails only dup fraction")
  }

  test("repetition: duplicate-bigram fraction matches hand computation") {
    val dir = fixtureDir(Seq(
      // bigrams: xy yx xy yx xy -> 5 total, 2 distinct, 3/5 duplicated
      (0L, "en", "x y x y x y"),
      // all bigrams distinct
      (1L, "en", "a b c d e")))
    val out = Curation.repetition.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(0L) == ((5L, 2L, 600000L, false)))
    assert(out(1L) == ((4L, 4L, 0L, true)))
  }

  test("token rarity: mean corpus frequency in exact integer ppm") {
    val dir = fixtureDir(Seq(
      (0L, "en", "common common rare"),
      (1L, "en", "common common common")))
    // freq: common=5, rare=1; doc0 = (5+5+1)*1e6 div 3; doc1 = 15e6 div 3
    val out = Curation.tokenRarity.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 3L, 11L, 3666666L), (1L, 3L, 15L, 5000000L)),
      s"unexpected rarity rows: ${out.toSeq}")
  }

  test("curation funnel stages are monotonically shrinking and consistent") {
    val rows = Curation.curationFunnel.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (raw, q, d, c) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(raw >= q && q >= d && d >= c,
        s"funnel must shrink monotonically: $r")
    }
    val totalRaw = rows.map(_.getLong(1)).sum
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 97 =!= 0).count()
    assert(totalRaw == expected, s"n_raw $totalRaw != train split $expected")
  }

  test("bloom decontamination equals the exact no-bloom computation") {
    val e = Tables.documents(spark, sf)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("shs", graft.functions.ShingleHash.shingleHashes(col("toks"), 3))
      .select(col("doc_id"), explode(col("shs")).as("hk"))
    val evalShingles = e.filter(col("doc_id") % 97 === 0).select(col("hk")).distinct()
    val exactBad = e.filter(col("doc_id") % 97 =!= 0)
      .join(evalShingles, Seq("hk"), "left_semi")
      .select("doc_id").distinct().count()
    val out = Curation.decontaminateBloom.fn(spark, sf)
      .agg(sum("n_train"), sum("n_dropped"), sum("n_kept")).head()
    assert(out.getLong(1) == exactBad,
      s"bloom path dropped ${out.getLong(1)} docs, exact path says $exactBad")
    assert(out.getLong(0) == out.getLong(1) + out.getLong(2),
      "dropped + kept must partition the training corpus")
  }

  test("line dedup: duplicated 15-token lines keep only the first occurrence") {
    def line(p: String) = (0 until 15).map(i => s"$p$i").mkString(" ")
    val dir = fixtureDir(Seq(
      (0L, "en", line("a") + " " + line("b")), // keeper of line a
      (1L, "en", line("a") + " " + line("c")), // dup of line a -> removed
      (2L, "fr", line("a")),                   // dup of line a -> removed
      (3L, "en", line("d") + " " + (0 until 5).map(i => s"e$i").mkString(" "))))
    val out = Curation.lineDedup.fn(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // en: 3 docs, 6 lines, one removed occurrence (doc1 line0) of 15 tokens
    assert(out("en") == ((3L, 6L, 1L, 15L, 1L)), s"en row: ${out("en")}")
    // fr: doc2's only line is a dup of doc0's -> removed entirely
    assert(out("fr") == ((1L, 1L, 1L, 15L, 1L)), s"fr row: ${out("fr")}")
  }

  test("lm surprisal: exact bin-length log2 bits match hand computation") {
    // corpus: N=5 tokens; cnt(x)=4, cnt(y)=1
    // bits(x) = len(bin 5) - len(bin 4) = 3-3 = 0; bits(y) = 3-1 = 2
    val dir = fixtureDir(Seq(
      (0L, "en", "x x x"),   // sum_bits 0, mbpt 0
      (1L, "en", "x y")))    // sum_bits 2, mbpt 2000/2 = 1000
    val out = Curation.lmSurprisal.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 1000L), (0L, 3L, 0L, 0L)),
      s"unexpected surprisal rows: ${out.toSeq}")
  }
}
