package graft.queries

import org.apache.spark.sql.functions._
import graft.model.{Money, Q, Tables}
import TextOps.{h60, h60Sql}

/** Corpus-curation operators over `documents` — the quality-filtering
  * half of a training-data pipeline (north star), complementing
  * [[Dedup]]'s near-duplicate half: heuristic quality rules
  * (Gopher/C4-style), within-document repetition detection, corpus-
  * frequency rarity scoring, and Bloom-prefiltered benchmark
  * decontamination.
  *
  * Cross-engine determinism: every rule threshold is an INTEGER
  * comparison (`3*n <= s` instead of `s/n >= 3`) so no rational ever
  * hits a rounding boundary, and every emitted ratio is a ppm BIGINT
  * via `floor(x*1e6+0.5)` ([[graft.model.Money]]) — the same IEEE
  * double ops on both engines, no cross-engine round-tie divergence.
  */
object Curation {

  private val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private val stopsSqlList = stops.map(s => s"'$s'").mkString(", ")

  /** DuckDB fragment of the train-side contamination rule over `eh`
    * rows (doc_id, hk): defines `ev` (distinct benchmark shingles) and
    * `bad` (train docs sharing ANY shingle with the benchmark) —
    * single-sourced for [[decontaminateBloom]] and the funnel. */
  private val evBadCte = """
      ev AS (SELECT DISTINCT hk FROM eh WHERE doc_id % 97 = 0),
      bad AS (SELECT DISTINCT doc_id FROM eh
              WHERE doc_id % 97 <> 0 AND hk IN (SELECT hk FROM ev))"""

  /** Per-document Gopher rule flags (shape of Rae et al. 2021 §A1.1,
    * thresholds adapted to this corpus), shared by the per-rule rollup
    * and the curation funnel so the rules cannot drift:
    *   - p_wc: word count in [50, 100000]
    *   - p_wlen: mean word length in [3, 10]  (as 3*n <= sum_len <= 10*n)
    *   - p_stop: >= 2 distinct stopword kinds present
    *   - p_dup: duplicate-token fraction <= 30%  (as 10*(n-d) <= 3*n)
    * All map-side per-row expressions over the scan. */
  private[queries] def withGopherFlags(docs: org.apache.spark.sql.DataFrame) =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")).cast("long"))
      // total word chars: text length minus the separator spaces
      .withColumn("wlen", length(replace(col("text"), lit(" "), lit(""))).cast("long"))
      .withColumn("nd", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_stop_kinds", expr(
        s"size(filter(array_distinct(toks), t -> t IN (${stopsSqlList})))").cast("long"))
      .withColumn("p_wc", col("n") >= 50L && col("n") <= 100000L)
      .withColumn("p_wlen", col("wlen") >= col("n") * 3L && col("wlen") <= col("n") * 10L)
      .withColumn("p_stop", col("n_stop_kinds") >= 2L)
      .withColumn("p_dup", (col("n") - col("nd")) * 10L <= col("n") * 3L)

  /** DuckDB CTE mirroring [[withGopherFlags]]: defines
    * `gr(doc_id, lang, p_wc, p_wlen, p_stop, p_dup)`. */
  private[queries] val gopherCte = s"""
      gd AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
               CAST(length(replace(text, ' ', '')) AS BIGINT) AS wlen,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS nd,
               CAST(len(list_filter(list_distinct(string_split(text, ' ')),
                                    t -> t IN (${stopsSqlList}))) AS BIGINT) AS n_stop_kinds
        FROM documents),
      gr AS (
        SELECT doc_id, lang,
               (n >= 50 AND n <= 100000) AS p_wc,
               (wlen >= n * 3 AND wlen <= n * 10) AS p_wlen,
               (n_stop_kinds >= 2) AS p_stop,
               ((n - nd) * 10 <= n * 3) AS p_dup
        FROM gd)"""

  /** Gopher-rule rollup per language; `keep` = all rules pass. At
    * 100 TB the only shuffle is the 5-row per-language rollup with
    * map-side partial aggregation. */
  val gopherRules = Q(
    "q_gopher_rules",
    (spark, dir) => {
      withGopherFlags(Tables.documents(spark, dir))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("p_wc"), 1L).otherwise(0L)).as("n_pass_wordcount"),
          sum(when(col("p_wlen"), 1L).otherwise(0L)).as("n_pass_wordlen"),
          sum(when(col("p_stop"), 1L).otherwise(0L)).as("n_pass_stopword"),
          sum(when(col("p_dup"), 1L).otherwise(0L)).as("n_pass_dupfrac"),
          sum(when(col("p_wc") && col("p_wlen") && col("p_stop") && col("p_dup"),
            1L).otherwise(0L)).as("n_keep"))
    },
    Some(s"""
      WITH $gopherCte
      SELECT lang, count(*) AS n_docs,
             CAST(sum(CASE WHEN p_wc THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_wordcount,
             CAST(sum(CASE WHEN p_wlen THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_wordlen,
             CAST(sum(CASE WHEN p_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_stopword,
             CAST(sum(CASE WHEN p_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_dupfrac,
             CAST(sum(CASE WHEN p_wc AND p_wlen AND p_stop AND p_dup
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
      FROM gr
      GROUP BY lang
    """))

  /** Within-document repetition: the duplicate-bigram fraction (the
    * Gopher "duplicate n-gram" family, n=2) per document, with a keep
    * flag at <= 20% duplicates decided by the exact integer compare
    * `5*(n_bi - n_distinct) <= n_bi`. Pure per-row array expressions —
    * no shuffle at all; the ppm column is reporting only, never a
    * threshold. */
  val repetition = Q(
    "q_repetition",
    (spark, dir) => {
      Tables.documents(spark, dir)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .withColumn("bi", expr(
          "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
        .withColumn("n_bigrams", size(col("bi")).cast("long"))
        .withColumn("n_distinct", size(array_distinct(col("bi"))).cast("long"))
        .select(col("doc_id"), col("n_bigrams"), col("n_distinct"),
          Money.cents((col("n_bigrams") - col("n_distinct")) / col("n_bigrams"),
            1000000.0).as("dup_ppm"),
          ((col("n_bigrams") - col("n_distinct")) * 5L <= col("n_bigrams")).as("keep"))
    },
    Some("""
      WITH b AS (
        SELECT doc_id,
               [tk[i] || ' ' || tk[i + 1] for i in range(1, len(tk))] AS bi
        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
        WHERE len(tk) >= 2)
      SELECT doc_id,
             CAST(len(bi) AS BIGINT) AS n_bigrams,
             CAST(len(list_distinct(bi)) AS BIGINT) AS n_distinct,
             CAST(floor(((len(bi) - len(list_distinct(bi))) / len(bi))
                        * 1000000.0 + 0.5) AS BIGINT) AS dup_ppm,
             ((len(bi) - len(list_distinct(bi))) * 5 <= len(bi)) AS keep
      FROM b
    """))

  /** Corpus-frequency rarity scoring: a unigram-LM-shaped quality
    * signal — each document's mean corpus frequency over its token
    * occurrences, in exact overflow-safe integer arithmetic (no float
    * summation across rows, whose partial-merge order is
    * nondeterministic in a distributed agg). Low mean frequency = rare
    * vocabulary. Emits the 20 rarest documents. Scale note: the raw
    * distinct-token set of 100 TB of web text (typos, URLs, code) runs
    * to billions of entries — tens of GB, past any broadcast
    * threshold — so the frequency side carries NO broadcast hint: the
    * freq aggregate's shuffle already leaves both sides hash-
    * partitioned on `t`, the sort-merge join reuses that exchange on
    * the build side, and AQE is still free to downgrade to broadcast
    * when runtime stats show the vocabulary is actually small
    * (PlanShapeSpec pins the no-static-broadcast property). The
    * per-doc rollup then shuffles on doc_id with map-side partials. */
  val tokenRarity = Q(
    "q_token_rarity",
    (spark, dir) => {
      val tok = Tables.documents(spark, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      val freq = tok.groupBy(col("t")).agg(count(lit(1)).as("f"))
      tok.join(freq, "t")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("f")).as("sum_freq"))
        // div-first with exact remainder correction, NOT sum_freq*1e6:
        // at corpus scale sum_freq alone reaches ~1e15 and the naive
        // scale-then-divide overflows int64. (q div n)*1e6 stays exact
        // and <= max_token_freq*1e6 (~1e18 at 100 TB, inside int64);
        // the remainder term is < n_tokens*1e6. Same floor semantics.
        .select(col("doc_id"), col("n_tokens"), col("sum_freq"),
          expr("""(sum_freq div n_tokens) * cast(1000000 AS bigint)
                  + ((sum_freq % n_tokens) * cast(1000000 AS bigint)) div n_tokens""")
            .as("mean_freq_ppm"))
        .orderBy(asc("mean_freq_ppm"), asc("doc_id"))
        .limit(20)
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      freq AS (SELECT t, count(*) AS f FROM tok GROUP BY t),
      d AS (
        SELECT doc_id, count(*) AS n_tokens, CAST(sum(f) AS BIGINT) AS sum_freq
        FROM tok JOIN freq USING (t)
        GROUP BY doc_id)
      SELECT doc_id, n_tokens, sum_freq,
             CAST((sum_freq // n_tokens) * 1000000
                  + ((sum_freq % n_tokens) * 1000000) // n_tokens AS BIGINT) AS mean_freq_ppm
      FROM d
      ORDER BY mean_freq_ppm NULLS FIRST, doc_id NULLS FIRST
      LIMIT 20
    """))

  /** Bloom-prefiltered benchmark decontamination — the TRAIN-side
    * direction (drop training documents that overlap the benchmark;
    * [[Dedup.decontaminate]] flags the EVAL side): a train document is
    * contaminated when ANY of its 3-token shingles occurs in the eval
    * set (doc_id % 97 = 0).
    *
    * The 100 TB mechanics this query exercises: the eval shingle set is
    * compiled into a Bloom filter (~10 bits/shingle at 1% fpp — the
    * structure cheap enough to probe for EVERY window of the corpus
    * scan) and applied as a map-side prefilter; only the ~1% surviving
    * candidates are checked against the exact set, so the final answer
    * is EXACT — the Bloom filter affects cost, never results — and the
    * corpus is never shuffled; only per-doc contamination ids
    * (<= corpus doc count) aggregate. */
  val decontaminateBloom = Q(
    "q_decontaminate_bloom",
    (spark, dir) => {
      val e = Dedup.withShingles(Tables.documents(spark, dir))
        .select(col("doc_id"), explode(col("shs")).as("hk"))
      val evalDistinct = e.filter(col("doc_id") % 97 === 0)
        .select(col("hk")).distinct()
      // the capped-probe bloom / distributed-semi-join dispatch was
      // born here and is now the family-wide single source
      // ([[Dedup.evalBoundedSemiJoin]], r15): LIMIT cap+1 ships at
      // most cap+1 longs regardless of corpus size; under the cap the
      // bloom+exact-set map-side path runs, over it the unhinted
      // semi-join — exact either way.
      val contaminated =
        Dedup.evalBoundedSemiJoin(spark, e.filter(col("doc_id") % 97 =!= 0),
            evalDistinct, "hk")
          .select(col("doc_id")).distinct()
      // No broadcast hint on `contaminated`: unlike the eval shingle
      // set (bounded by the benchmark contract), the flagged-doc set is
      // corpus-derived — one common n-gram in the eval split can flag a
      // corpus-proportional train fraction. AQE broadcasts it while it
      // fits and falls back to a shuffled join at scale.
      Tables.documents(spark, dir)
        .filter(col("doc_id") % 97 =!= 0)
        .join(contaminated.withColumn("bad", lit(true)), Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_train"),
          sum(when(col("bad"), 1L).otherwise(0L)).as("n_dropped"),
          sum(when(col("bad").isNull, 1L).otherwise(0L)).as("n_kept"))
    },
    Some(s"""
      WITH ${Dedup.shingleCte},
      eh AS (SELECT doc_id, ${h60Sql("sh1")} AS hk FROM e),
      $evBadCte
      SELECT lang, count(*) AS n_train,
             CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM bad)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
             CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM bad)
                      THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
      FROM documents
      WHERE doc_id % 97 <> 0
      GROUP BY lang
    """))

  /** The curation funnel — the whole pipeline composed end to end, the
    * report a data team actually reads: per language, how many
    * training documents survive each successive stage:
    *   n_raw     — the training split (non-benchmark docs)
    *   n_quality — + pass all Gopher rules ([[withGopherFlags]])
    *   n_dedup   — + canonical under corpus-wide Jaccard clustering
    *               (the [[Dedup.nonCanonical]] drop set: transitive
    *               connected components over exact j >= 0.5 pairs)
    *   n_clean   — + share no 3-gram with the benchmark split
    *               (the [[decontaminateBloom]] rule — ANY shared
    *               shingle drops the train doc; [[Dedup.decontaminate]]
    *               is the different, eval-side >= 50% flag)
    * Composition is the scale story: the rule flags are map-side
    * per-row expressions. The dup and contamination drop sets are
    * small relative to the corpus but CORPUS-PROPORTIONAL, so they
    * carry NO broadcast hint — AQE broadcasts them while they fit and
    * falls back to shuffled joins at 100× rather than dying on a
    * forced hint. The eval-shingle membership pass runs through
    * [[Dedup.evalBoundedSemiJoin]] (r15 — the old unconditional
    * broadcast hint was justified by an "eval is MBs by contract"
    * claim the fixture's corpus-derived eval set does not satisfy):
    * capped probe + bloom map-side filter while eval is bounded,
    * unhinted distributed semi-join past the cap. */
  val curationFunnel = Q(
    "q_curation_funnel",
    (spark, dir) => {
      val flags = withGopherFlags(Tables.documents(spark, dir))
        .select(col("doc_id"), col("lang"),
          (col("p_wc") && col("p_wlen") && col("p_stop") && col("p_dup")).as("q_keep"))
      // ONE eagerly-materialized shingle frame serves the dedup pair
      // generation AND both decontamination sides (several
      // computations otherwise). Eager localCheckpoint, not lazy
      // persist: consumers racing a lazy cache is the documented
      // first-rep stampede (mmr_rerank, dup_pagerank, srpProbePairs,
      // prefix-filter, link-prediction all hit it before this site).
      val s = Dedup.withShingles(Tables.documents(spark, dir))
        .select(col("doc_id"), col("shs"), col("n_sh"))
        .localCheckpoint(true)
      val e = s.select(col("doc_id"), col("n_sh"),
                       explode(col("shs")).as("hk"))
      // the SHARED graph edge union (r17 review finding: this site
      // hand-composed jaccard ∪ digest stars and silently missed the
      // new cappedBandStars rescue while the oracle's dupEdgesCte
      // included it — the funnel's dedup stage is exactly where mass
      // near-dup recall loss would hide). dupGraphEdgesFrom is the one
      // spelling; it cannot drift from the oracle again.
      val dup = Dedup.nonCanonical(Dedup.dupGraphEdgesFrom(spark, dir, s, e))
        .withColumn("dup", lit(true))
      val evalShingles = e.filter(col("doc_id") % 97 === 0).select(col("hk")).distinct()
      val contaminated = Dedup.evalBoundedSemiJoin(spark,
          e.filter(col("doc_id") % 97 =!= 0), evalShingles, "hk")
        .select(col("doc_id")).distinct().withColumn("bad", lit(true))
      flags.filter(col("doc_id") % 97 =!= 0)
        .join(dup, Seq("doc_id"), "left")
        .join(contaminated, Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("q_keep"), 1L).otherwise(0L)).as("n_quality"),
          sum(when(col("q_keep") && col("dup").isNull, 1L).otherwise(0L)).as("n_dedup"),
          sum(when(col("q_keep") && col("dup").isNull && col("bad").isNull, 1L)
            .otherwise(0L)).as("n_clean"))
    },
    Some(s"""
      WITH RECURSIVE
      ${Dedup.shingleCte},
      eh AS (SELECT doc_id, n_sh, ${h60Sql("sh1")} AS hk FROM e),
      ${Dedup.jaccardPairsCte("eh")},
      ${Dedup.dupEdgesCte},
      ${Dedup.ccCteOver("dpairs")},
      ${Dedup.droppedCte},
      $evBadCte,
      $gopherCte
      SELECT lang, count(*) AS n_raw,
             CAST(sum(CASE WHEN q_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
             CAST(sum(CASE WHEN q_keep AND NOT is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
             CAST(sum(CASE WHEN q_keep AND NOT is_dup AND NOT is_bad
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
      FROM (SELECT lang,
                   (p_wc AND p_wlen AND p_stop AND p_dup) AS q_keep,
                   doc_id IN (SELECT doc_id FROM dropped) AS is_dup,
                   doc_id IN (SELECT doc_id FROM bad) AS is_bad
            FROM gr
            WHERE doc_id % 97 <> 0)
      GROUP BY lang
    """))

  // ---- PII redaction ------------------------------------------------

  /** PII patterns, shared verbatim by both engines. Written without
    * backslash classes (`[0-9]` not `\d`, no `\b`) so the SAME string
    * is a valid, identically-behaving regex under Java's engine
    * (Spark) and RE2 (DuckDB) — escape-dialect divergence is the
    * classic cross-engine regex trap. */
  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z][a-z]+"
  private val ipv4Re = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
  private val phoneRe = "555-[0-9]{4}"

  /** PII redaction — the scrub pass a training corpus takes before
    * anything else sees it: find-and-mask emails, IPv4 addresses and
    * phone-shaped numbers, and report per-language counts plus the
    * redacted byte volume. A pure map-side pass at any scale: regex
    * count + replace per row, then a 5-row per-language rollup with
    * map-side partials — zero data-sized shuffles.
    *
    * The synthetic fixture contains no PII (no digits at all), so the
    * query INJECTS it deterministically from doc_id — every doc gets
    * an email, every 3rd an IP, every 5th a phone — mirrored exactly
    * in the oracle. The operator under test is the redaction
    * machinery; the injection is the fixture's stand-in for dirty
    * text, same approach as [[graft.multimodal.Multimodal]]'s payload
    * fake. */
  val piiRedact = Q(
    "q_pii_redact",
    (spark, dir) => {
      val withPii = Tables.documents(spark, dir)
        .withColumn("pii_text", concat(
          col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" from 10."), (col("doc_id") % 256).cast("string"), lit(".0.1")))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" call 555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))))
      val clean = regexp_replace(
        regexp_replace(
          regexp_replace(col("pii_text"), lit(emailRe), lit("<EMAIL>")),
          lit(ipv4Re), lit("<IP>")),
        lit(phoneRe), lit("<PHONE>"))
      withPii
        .select(col("lang"),
          regexp_count(col("pii_text"), lit(emailRe)).as("e"),
          regexp_count(col("pii_text"), lit(ipv4Re)).as("i"),
          regexp_count(col("pii_text"), lit(phoneRe)).as("p"),
          (length(col("pii_text")) - length(clean)).cast("long").as("shrunk"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("e")).cast("long").as("n_emails"),
             sum(col("i")).cast("long").as("n_ips"),
             sum(col("p")).cast("long").as("n_phones"),
             sum(col("shrunk")).as("chars_redacted"))
    },
    Some(s"""
      WITH p AS (
        SELECT lang,
               text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                    || CASE WHEN doc_id % 3 = 0
                            THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
                            ELSE '' END
                    || CASE WHEN doc_id % 5 = 0
                            THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                            ELSE '' END AS pii_text
        FROM documents)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(len(regexp_extract_all(pii_text, '$emailRe'))) AS BIGINT) AS n_emails,
             CAST(sum(len(regexp_extract_all(pii_text, '$ipv4Re'))) AS BIGINT) AS n_ips,
             CAST(sum(len(regexp_extract_all(pii_text, '$phoneRe'))) AS BIGINT) AS n_phones,
             CAST(sum(length(pii_text) - length(
               regexp_replace(regexp_replace(regexp_replace(pii_text,
                 '$emailRe', '<EMAIL>', 'g'),
                 '$ipv4Re', '<IP>', 'g'),
                 '$phoneRe', '<PHONE>', 'g'))) AS BIGINT) AS chars_redacted
      FROM p
      GROUP BY lang
    """))

  // ---- DSIR importance resampling ------------------------------------

  /** DSIR data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169):
    * score each raw document by how much it looks like a TARGET domain
    * (here: the English slice) under hashed-unigram bag-of-words
    * models — log p_target(x) - log p_raw(x) with add-one smoothing
    * over B=64 hash buckets — and keep the top-scoring documents.
    *
    * Cross-engine exactness: the per-BUCKET log-ratio is the only
    * transcendental, computed once per bucket and immediately fixed to
    * a ppm BIGINT (64 `ln` calls total); each document's score is then
    * a pure INTEGER dot product of its bucket counts with those fixed
    * weights — associative, order-independent, no float accumulation
    * across rows (the same discipline as [[tokenRarity]]).
    *
    * Known residual risk, accepted: if JVM `Math.log` and DuckDB `ln`
    * ever differ in the last ulp AND that ulp lands exactly on a
    * `.5` ppm rounding boundary, one bucket's w_ppm flips by 1 and the
    * dot product amplifies it. Probability per bucket is ~1e-10 (one
    * ulp of x*1e6 against a unit interval); with 64 buckets this is
    * ~1e-8 per SF. Verified hash-stable at sf0.001/0.01/0.1 across
    * consecutive runs (round 7); an exactness GUARANTEE would need an
    * ln-free rational surrogate, which would no longer be the DSIR
    * estimator.
    *
    * 100 TB shape: two token-bucket aggregates (64 groups, map-side
    * partials — the shuffle carries 64 rows per partition), a
    * broadcast of the 64-row weight table (bounded by construction, a
    * true constant unlike the vocabulary broadcast this module
    * removed in round 5), one (doc, bucket) rollup, and a
    * TakeOrderedAndProject top-20. */
  val dsirWeights = Q(
    "q_dsir_weights",
    (spark, dir) => {
      val nb = 64L
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        .withColumn("b", pmod(h60(concat(lit("dsir1_"), col("tok"))), lit(nb)))
      val buckets = toks.groupBy(col("b"))
        .agg(count(lit(1)).as("r"),
             sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t"))
      val totals = buckets.agg(sum(col("r")).as("rr"), sum(col("t")).as("tt"))
      val weights = buckets.crossJoin(totals)
        .select(col("b"), Money.cents(
          log((col("t") + 1.0) / (col("tt") + 64.0)) -
          log((col("r") + 1.0) / (col("rr") + 64.0)), 1000000.0).as("w_ppm"))
      toks.groupBy(col("doc_id"), col("lang"), col("b"))
        .agg(count(lit(1)).as("cnt"))
        .join(broadcast(weights), "b")
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("cnt")).as("n_tokens"),
             sum(col("cnt") * col("w_ppm")).as("weight_ppm"))
        .orderBy(desc("weight_ppm"), asc("doc_id"))
        .limit(20)
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, lang,
               ${h60Sql("'dsir1_' || tok")} % 64 AS b
        FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
              FROM documents)),
      buckets AS (
        SELECT b, count(*) AS r,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS t
        FROM toks GROUP BY b),
      totals AS (
        SELECT CAST(sum(r) AS BIGINT) AS rr, CAST(sum(t) AS BIGINT) AS tt
        FROM buckets),
      weights AS (
        SELECT b, CAST(floor((ln((t + 1.0) / (tt + 64.0))
                            - ln((r + 1.0) / (rr + 64.0))) * 1000000.0 + 0.5)
                       AS BIGINT) AS w_ppm
        FROM buckets, totals)
      SELECT doc_id, lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             CAST(sum(cnt * w_ppm) AS BIGINT) AS weight_ppm
      FROM (SELECT doc_id, lang, b, count(*) AS cnt
            FROM toks GROUP BY 1, 2, 3)
      JOIN weights USING (b)
      GROUP BY doc_id, lang
      ORDER BY weight_ppm DESC NULLS LAST, doc_id NULLS FIRST
      LIMIT 20
    """))

  // ---- C4-style line-level dedup -------------------------------------

  /** Tokens per pseudo-line in [[lineDedup]]. The synthetic corpus is
    * single-line (no '\n' anywhere in `documents.text`), so fixed-width
    * 15-token segments stand in for newline segmentation; a real corpus
    * swaps `split(text, "\n")` into the same plan. */
  private val lineLen = 15

  /** C4-style cross-document line deduplication (Raffel et al. 2020,
    * C4: lines occurring more than once in the dataset are dropped,
    * keeping one occurrence) — the sub-document dedup granularity
    * between [[Dedup]]'s whole-document hashing and
    * `q_exact_substring`'s span index: boilerplate (nav bars, license
    * headers, cookie banners) repeats across pages whose documents are
    * NOT near-duplicates, and line dedup is the standard scrub for it.
    *
    * Rule: a line occurring >1 time corpus-wide keeps only its first
    * occurrence in (doc_id, line_no) order; every other occurrence is
    * removed. Reports the per-language removal funnel.
    *
    * 100 TB shape: lines are hashed ([[h60]]) and aggregated BY HASH —
    * `min(struct(doc_id, line_no))` picks the keeper and `count`
    * detects duplication in ONE shuffle with map-side partials (no
    * all-pairs, no per-line window over the corpus); the occurrence →
    * stats join is an equi-join on the same hash key, so the exchange
    * is reused, and the rollup is a 5-row per-language aggregate. */
  val lineDedup = Q(
    "q_line_dedup",
    (spark, dir) => {
      val L = lineLen
      val occ = Tables.documents(spark, dir)
        .withColumn("tk", split(col("text"), " "))
        .select(col("doc_id"), col("lang"), posexplode(expr(
          s"""transform(sequence(0, (size(tk) + ${L - 1}) div $L - 1),
                        i -> concat_ws(' ', slice(tk, i * $L + 1, $L)))""")))
        .select(col("doc_id"), col("lang"), col("pos").cast("long").as("line_no"),
          size(split(col("col"), " ")).cast("long").as("line_toks"),
          h60(col("col")).as("hk"))
      val stats = occ.groupBy(col("hk"))
        .agg(count(lit(1)).as("occ_cnt"),
             min(struct(col("doc_id"), col("line_no"))).as("keeper"))
      occ.join(stats, "hk")
        .withColumn("removed", col("occ_cnt") > 1 &&
          (col("doc_id") =!= col("keeper.doc_id") ||
           col("line_no") =!= col("keeper.line_no")))
        .groupBy(col("lang"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
             count(lit(1)).as("n_lines"),
             sum(when(col("removed"), 1L).otherwise(0L)).as("n_removed_lines"),
             sum(when(col("removed"), col("line_toks")).otherwise(0L)).as("tokens_removed"),
             countDistinct(when(col("removed"), col("doc_id"))).as("n_docs_affected"))
    },
    Some(s"""
      WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
      l AS (SELECT doc_id, lang,
              unnest(range(0, (len(tk) + 14) // 15)) AS line_no,
              unnest([array_to_string(tk[(i * 15 + 1):(i * 15 + 15)], ' ')
                      for i in range(0, (len(tk) + 14) // 15)]) AS line
            FROM d),
      o AS (SELECT doc_id, lang, line_no,
              CAST(len(string_split(line, ' ')) AS BIGINT) AS line_toks,
              ${h60Sql("line")} AS hk FROM l),
      r AS (SELECT lang, doc_id, line_toks,
              (count(*) OVER (PARTITION BY hk) > 1 AND
               row_number() OVER (PARTITION BY hk ORDER BY doc_id NULLS FIRST, line_no NULLS FIRST) > 1) AS removed
            FROM o)
      SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_lines,
             CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS n_removed_lines,
             CAST(sum(CASE WHEN removed THEN line_toks ELSE 0 END) AS BIGINT) AS tokens_removed,
             count(DISTINCT CASE WHEN removed THEN doc_id END) AS n_docs_affected
      FROM r
      GROUP BY lang
    """))

  // ---- Unigram-LM surprisal quality filter ---------------------------

  /** CCNet-style language-model quality filter (Wenzek et al. 2020:
    * rank documents by LM perplexity; high perplexity = far from the
    * reference distribution) with an EXACT integer surrogate: each
    * token's surprisal is floor(log2(N)) - floor(log2(cnt)) bits under
    * the corpus's own unigram model, computed as
    * `length(bin(N)) - length(bin(cnt))` — binary digit counts, pure
    * integer string ops both engines evaluate identically. Unlike
    * [[dsirWeights]]' 64 documented-risk `ln` calls, this query has NO
    * transcendental anywhere: the score is exact by construction.
    * Emits the 20 highest-surprisal documents (the discard candidates)
    * with milli-bits-per-token via exact integer division.
    *
    * Complements [[tokenRarity]] (arithmetic-mean corpus frequency —
    * dominated by a doc's most common token) with the information-
    * theoretic mean: surprisal SUMS log-counts, so one ultra-rare token
    * can't be masked by many common ones.
    *
    * 100 TB shape: the (doc, tok) pre-aggregate shrinks the join input
    * to distinct per-doc tokens; the vocabulary side carries NO
    * broadcast hint (billions of distinct tokens in web text — the
    * [[tokenRarity]] round-5 lesson): the count aggregate leaves both
    * sides hash-partitioned on `tok`, the sort-merge join reuses that
    * exchange, AQE may still downgrade to broadcast when runtime stats
    * allow. The 1-row total broadcasts; the finish is a (doc) rollup
    * with map-side partials and a TakeOrderedAndProject top-20. */
  val lmSurprisal = Q(
    "q_lm_surprisal",
    (spark, dir) => {
      val dt = Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("lang"), col("tok"))
        .agg(count(lit(1)).as("c_dt"))
      val vocab = dt.groupBy(col("tok")).agg(sum(col("c_dt")).as("cnt"))
      val totals = vocab.agg(sum(col("cnt")).as("n_total"))
      dt.join(vocab, "tok")
        .crossJoin(broadcast(totals))
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("c_dt")).as("n_tokens"),
             sum(col("c_dt") *
               (length(bin(col("n_total"))) - length(bin(col("cnt")))).cast("long"))
               .as("sum_bits"))
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("sum_bits"),
          expr("(sum_bits * 1000) div n_tokens").as("mbpt"))
        .orderBy(desc("mbpt"), asc("doc_id"))
        .limit(20)
    },
    Some("""
      WITH dt AS (
        SELECT doc_id, lang, tok, count(*) AS c_dt
        FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY 1, 2, 3),
      v AS (SELECT tok, CAST(sum(c_dt) AS BIGINT) AS cnt FROM dt GROUP BY tok),
      n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM v),
      s AS (SELECT doc_id, lang,
              CAST(sum(c_dt) AS BIGINT) AS n_tokens,
              CAST(sum(c_dt * (length(bin(n_total)) - length(bin(cnt)))) AS BIGINT) AS sum_bits
            FROM dt JOIN v USING (tok) CROSS JOIN n
            GROUP BY 1, 2)
      SELECT doc_id, lang, n_tokens, sum_bits,
             CAST((sum_bits * 1000) // n_tokens AS BIGINT) AS mbpt
      FROM s
      ORDER BY mbpt DESC NULLS LAST, doc_id NULLS FIRST
      LIMIT 20
    """))

  /** Text normalization + its dedup payoff in ONE pass: the standard
    * LLM-corpus canonicalization chain (lowercase -> strip non-
    * alphanumerics -> collapse runs of spaces -> trim), reported as
    * per-language effect stats INCLUDING the collision gain — how many
    * raw-distinct documents collapse once normalized. That last number
    * is the operator's reason to exist: exact dedup
    * ([[Dedup.exact]]) keyed on raw bytes misses trivially-reformatted
    * copies, and `distinct_raw - distinct_norm` measures exactly what
    * normalization-aware dedup would additionally remove.
    *
    * Cross-engine: both regexes are literal character classes (no
    * engine-specific syntax between Java regex and RE2); DuckDB needs
    * the explicit 'g' flag for replace-all, which is Spark's default.
    * Counting distinct md5s (not strings) keeps the shuffle rows
    * fixed-width.
    *
    * 100 TB shape: one scan, one shuffle (the groupBy lang) with
    * map-side partial aggregation; the normalization chain is three
    * codegen'd string expressions on the scan — no UDF, no explode. */
  val textNormalize = Q(
    "q_text_normalize",
    (spark, dir) => {
      val norm = trim(regexp_replace(regexp_replace(
        lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      Tables.documents(spark, dir)
        .withColumn("norm", norm)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(when(col("norm") =!= col("text"), 1L).otherwise(0L))
               .as("n_changed"),
             sum(length(col("text")) - length(col("norm")))
               .cast("long").as("chars_stripped"),
             countDistinct(md5(col("text").cast("binary"))).as("distinct_raw"),
             countDistinct(md5(col("norm").cast("binary"))).as("distinct_norm"))
    },
    Some("""
      WITH n AS (
        SELECT lang, text,
               trim(regexp_replace(regexp_replace(
                 lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        FROM documents)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(CASE WHEN norm <> text THEN 1 ELSE 0 END) AS BIGINT)
               AS n_changed,
             CAST(sum(length(text) - length(norm)) AS BIGINT) AS chars_stripped,
             count(DISTINCT md5(text)) AS distinct_raw,
             count(DISTINCT md5(norm)) AS distinct_norm
      FROM n
      GROUP BY lang
    """))

  /** Per-source document cap — the per-domain cap every web-scale
    * curation pipeline applies so no single crawl source dominates
    * the mix (C4 and Gopher both cap per-domain contribution). Keeps
    * the 5 longest documents per source (n_chars DESC, doc_id
    * tie-break) via the mergeable bounded-heap
    * [[graft.functions.Aggregators.TopK]] — the shuffle carries at
    * most k rows per (source, partition) instead of sorting every
    * group member the way the oracle's `row_number()` window does,
    * the difference that matters when one domain holds a billion
    * pages. Emits per source: total docs, kept docs, kept chars. */
  val sourceCap = Q(
    "q_source_cap",
    (spark, dir) => {
      val topk = udaf(new graft.functions.Aggregators.TopK(5))
      Tables.documents(spark, dir)
        .select(col("source"), col("n_chars"), col("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
             topk(col("n_chars"), col("doc_id")).as("top"))
        .select(col("source"), col("n_docs"),
          size(col("top.items")).cast("long").as("n_kept"),
          expr("aggregate(top.items, CAST(0 AS BIGINT), (a, x) -> a + x._1)")
            .as("kept_chars"))
    },
    Some("""
      WITH r AS (
        SELECT source, n_chars, doc_id,
               -- a NULL n_chars row has NO rank (TopK skips NULL values
               -- structurally — r16 ADVICE: NULLS LAST alone would still
               -- hand rn <= 5 to NULL rows in small groups); the extra
               -- (n_chars IS NULL) partition key keeps the window
               -- single-pass while the CASE voids the NULL partition
               CASE WHEN n_chars IS NULL THEN NULL ELSE
                 row_number() OVER (PARTITION BY source, (n_chars IS NULL)
                   ORDER BY n_chars DESC NULLS LAST, doc_id NULLS FIRST)
               END AS rn
        FROM documents)
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(sum(CASE WHEN rn <= 5 THEN n_chars ELSE 0 END) AS BIGINT)
               AS kept_chars
      FROM r GROUP BY source
    """))

  /** Length-bucket padding audit for batched training: documents land
    * in power-of-two length buckets (bucket = 2^ceil(log2 n_chars) —
    * the next-pow2 a fixed-shape batcher would pad to) and the query
    * reports per bucket how many pad characters that costs. The
    * bucket is EXACT integer bit-math on both engines —
    * `1 << length(bin(n_chars - 1))` (NOTES: length(bin(x))-1 is
    * floor(log2 x) in both engines; on x-1 it yields ceil) — zero
    * transcendentals, zero floats. One scan of two pruned columns,
    * one ~10-row aggregate: the cheapest query in the battery at any
    * scale.
    *
    * Empty documents bucket as 1 EXPLICITLY (`greatest(n_chars, 1)`,
    * both engines): without the floor, n_chars = 0 reaches
    * `1 << length(bin(-1))` = `1 << 64`, where the engines diverge
    * CATASTROPHICALLY — Spark's shiftleft masks the count to 6 bits
    * (Java semantics, silent bucket 1) while DuckDB raises an
    * out-of-range ERROR and aborts the whole query (r14 review,
    * verified empirically; fixtures carry no empty docs, so the
    * divergence was latent). */
  val lengthBuckets = Q(
    "q_length_buckets",
    (spark, dir) => {
      Tables.documents(spark, dir)
        .select(expr(
          "shiftleft(CAST(1 AS BIGINT), length(bin(greatest(n_chars, 1) - 1)))")
                  .as("bucket"),
                col("n_chars"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .withColumn("padding_waste",
          col("bucket") * col("n_docs") - col("sum_chars"))
    },
    Some("""
      SELECT CAST(1 << length(bin(greatest(n_chars, 1) - 1)) AS BIGINT) AS bucket,
             count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             CAST(CAST(1 << length(bin(greatest(n_chars, 1) - 1)) AS BIGINT) * count(*)
                  - sum(n_chars) AS BIGINT) AS padding_waste
      FROM documents
      GROUP BY 1
    """))

  /** Per-source dataset card — the governance rollup a dataset ships
    * with (Datasheets for Datasets, Gebru et al. 2018): for every
    * source, document/token/char volume, language breadth, the
    * exact-duplicate rate and a simple length-window quality pass
    * rate, each rate an exact integral ppm. One view a data steward
    * reads before mixing the source into a 100-TB training run; the
    * per-metric deep dives ([[gopherRules]], [[Dedup]]'s funnel,
    * q_source_overlap) hang off its rows.
    *
    * 100 TB shape: ONE corpus scan derives per-doc metrics map-side
    * (md5 content hash, split token count); the duplicate rate rides
    * a hash agg on the content hash joined back by hash (both
    * shuffles on high-cardinality keys, map-side partials); the final
    * per-source agg is a handful of keys. count(DISTINCT lang) plans
    * as Spark's two-phase expand — exact, no sketch — because the
    * lang domain is tiny; at a larger domain it would swap for
    * approx_count_distinct (the [[Relational]] A2 pattern). */
  val datasetCard = Q(
    "q_dataset_card",
    (spark, dir) => {
      val d = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
                md5(col("text").cast("binary")).as("h"),
                size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val copies = d.groupBy(col("h")).agg(count(lit(1)).as("copies"))
      d.join(copies, "h")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_tokens")).as("n_tokens"),
             sum(col("n_chars")).as("n_chars"),
             countDistinct(col("lang")).as("n_langs"),
             sum(when(col("copies") > 1, 1L).otherwise(0L)).as("dup_docs"),
             sum(when(col("n_chars").between(200, 20000), 1L).otherwise(0L))
               .as("quality_pass"))
        .withColumn("dup_ppm", expr("dup_docs * 1000000 div n_docs"))
        .withColumn("pass_ppm", expr("quality_pass * 1000000 div n_docs"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, source, lang, n_chars, md5(text) AS h,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents),
      c AS (SELECT h, count(*) AS copies FROM d GROUP BY 1),
      s AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               CAST(sum(n_chars) AS BIGINT) AS n_chars,
               count(DISTINCT lang) AS n_langs,
               CAST(sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS dup_docs,
               CAST(sum(CASE WHEN n_chars BETWEEN 200 AND 20000
                        THEN 1 ELSE 0 END) AS BIGINT) AS quality_pass
        FROM d JOIN c USING (h)
        GROUP BY source)
      SELECT source, n_docs, n_tokens, n_chars, n_langs, dup_docs,
             quality_pass,
             (dup_docs * 1000000) // n_docs AS dup_ppm,
             (quality_pass * 1000000) // n_docs AS pass_ppm
      FROM s
    """))

  def all: Seq[Q] = Seq(gopherRules, repetition, tokenRarity, decontaminateBloom,
    curationFunnel, piiRedact, dsirWeights, lineDedup, lmSurprisal,
    textNormalize, sourceCap, lengthBuckets, datasetCard)
}
