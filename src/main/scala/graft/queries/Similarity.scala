package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.{Q, Tables}

/** Similarity search over the `embeddings` table (north star):
  * brute-force cosine top-k as the exact baseline, cosine k-NN for a
  * query subset, blocked near-duplicate pairs, and a
  * sign-random-projection (SRP) LSH ANN as the scale path.
  *
  * All cosine math runs in double with a sequential left fold on both
  * engines (Spark `aggregate` HOF; DuckDB `list_reduce`), so results
  * are bit-identical and oracle-comparable. The SRP planes are
  * md5-derived (deterministic, no RNG state).
  */
object Similarity {

  import graft.functions.VectorFunctions.{dotp, l2norm}

  /** embedding cast to array<double>; norm via the codegen'd
    * [[graft.functions.DotProduct]] (same IEEE fold order as the HOF
    * `aggregate(transform(...))` formulation, ~10x less per-row cost). */
  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("vd", expr("transform(embedding, x -> cast(x AS DOUBLE))"))
      .withColumn("nrm", l2norm(col("vd")))

  private def dot(a: String, b: String): Column = dotp(col(a), col(b))

  /** DuckDB double-precision sequential dot product over FLOAT[]. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
                                   i -> $a[i]::DOUBLE * $b[i]::DOUBLE),
                    (x, y) -> x + y)"""
  private def nrmSql(a: String): String =
    s"""sqrt(list_reduce(list_transform(range(1, len($a) + 1),
                                        i -> $a[i]::DOUBLE * $a[i]::DOUBLE),
                         (x, y) -> x + y))"""

  /** Brute-force cosine top-10 for one query vector (vec_id = 0). */
  val cosineTopk = Q(
    "q_cosine_topk",
    (spark, dir) => {
      val e = emb(spark, dir)
      val qv = e.filter(col("vec_id") === 0)
        .select(col("vd").as("qv"), col("nrm").as("qnrm"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .withColumn("sim", round(dot("vd", "qv") / (col("nrm") * col("qnrm")), 6))
        .orderBy(desc("sim"), asc("vec_id"))
        .limit(10)
        .select(col("vec_id"), col("label"), col("sim"))
    },
    Some(s"""
      WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
      SELECT vec_id, label,
             round(${dotSql("embedding", "qv")}
                   / (${nrmSql("embedding")} * ${nrmSql("qv")}), 6) AS sim
      FROM embeddings, q
      WHERE vec_id <> 0
      ORDER BY sim DESC, vec_id
      LIMIT 10
    """))

  /** Exact nearest neighbor for a 10% query subset (vec_id % 10 = 0):
    * the brute-force baseline the ANN path is measured against.
    * Broadcast the query side; per-query argmax via window rank. */
  val cosineKnn = Q(
    "q_cosine_knn",
    (spark, dir) => {
      val e = emb(spark, dir)
      val queries = e.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("q_id"), col("vd").as("qv"), col("nrm").as("qnrm"))
      // top-1 via max_by (single-pass hash agg with map-side partials)
      // instead of a per-group window sort; tie-break = smallest vec_id
      // encoded as max of (sim, -vec_id), identical to the oracle's
      // row_number ordering
      e.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", round(dot("vd", "qv") / (col("nrm") * col("qnrm")), 6))
        .groupBy(col("q_id"))
        .agg(max_by(struct(col("vec_id").as("nn_id"), col("sim")),
                    struct(col("sim"), -col("vec_id"))).as("m"))
        .select(col("q_id"), col("m.nn_id").as("nn_id"), col("m.sim").as("sim"))
    },
    Some(s"""
      SELECT q_id, nn_id, sim FROM (
        SELECT q.vec_id AS q_id, d.vec_id AS nn_id,
               round(${dotSql("d.embedding", "q.embedding")}
                     / (${nrmSql("d.embedding")} * ${nrmSql("q.embedding")}), 6) AS sim,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY round(${dotSql("d.embedding", "q.embedding")}
                     / (${nrmSql("d.embedding")} * ${nrmSql("q.embedding")}), 6) DESC,
                                  d.vec_id) AS rn
        FROM embeddings q JOIN embeddings d ON d.vec_id <> q.vec_id
        WHERE q.vec_id % 10 = 0)
      WHERE rn = 1
    """))

  /** Embedding near-duplicate pairs, blocked by label (coarse cluster
    * blocking keeps the pair space linear-ish instead of n^2): top-20
    * most-similar same-label pairs. */
  val nearDupPairs = Q(
    "q_embed_neardup",
    (spark, dir) => {
      val e = emb(spark, dir)
        .select(col("vec_id"), col("label"), col("vd"), col("nrm"))
      val a = e.select(col("label"), col("vec_id").as("id_a"),
                       col("vd").as("va"), col("nrm").as("na"))
      val b = e.select(col("label"), col("vec_id").as("id_b"),
                       col("vd").as("vb"), col("nrm").as("nb"))
      a.join(b, Seq("label"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("sim", round(dot("va", "vb") / (col("na") * col("nb")), 6))
        .orderBy(desc("sim"), asc("id_a"), asc("id_b"))
        .limit(20)
        .select(col("label"), col("id_a"), col("id_b"), col("sim"))
    },
    Some(s"""
      SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
             round(${dotSql("a.embedding", "b.embedding")}
                   / (${nrmSql("a.embedding")} * ${nrmSql("b.embedding")}), 6) AS sim
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      ORDER BY sim DESC, id_a, id_b
      LIMIT 20
    """))

  /** SRP-LSH ANN (scale path): 8 tables x 5 md5-derived hyperplanes;
    * vectors bucket by sign bits, candidates collide in >=1 table,
    * rerank exact cosine, keep per-query top-1. Probabilistic recall
    * -> no SQL oracle; SimilaritySpec measures recall vs q_cosine_knn.
    */
  val annSrp = Q(
    "q_ann_srp",
    (spark, dir) => {
      val nTables = 8
      // 5 sign bits per table = 32 buckets: ~2x fewer candidate pairs
      // than 4 bits at sf0.1 (the rerank is the cost center); 8-table
      // OR measures 0.44 top-1 recall on the test embeddings (6 bits
      // halves pairs again but drops recall to the 0.3 spec floor).
      val nBits = 5
      // Deterministic hyperplanes: component j of plane (t, p) is an
      // md5-derived uniform in [-1, 1). The 8x5x64 plane tensor is a
      // few KB, so it is computed driver-side and inlined as literals:
      // each vector gets all 32 sign bits in ONE projection — no
      // crossJoin against a plane table, no 32x row blow-up, no
      // groupBy shuffle to reassemble buckets (was 9s of the bench).
      def h60Scala(s: String): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(0, 15), 16)
      }
      val planes = Array.tabulate(nTables, nBits, 64) { (t, p, j) =>
        h60Scala(s"${t}_${p}_${j}") / math.pow(2, 59) - 1.0
      }
      val e = emb(spark, dir).select(col("vec_id"), col("vd"), col("nrm"))
      val bucketCols = (0 until nTables).map { t =>
        val bucket = (0 until nBits).map { p =>
          val planeDot = dotp(col("vd"), typedLit(planes(t)(p).toSeq))
          when(planeDot >= 0, lit((1L << p))).otherwise(lit(0L))
        }.reduce(_ + _)
        struct(lit(t).as("t"), bucket.as("bucket"))
      }
      val buckets = e
        .select(col("vec_id"), explode(array(bucketCols: _*)).as("b"))
        .select(col("vec_id"), col("b.t").as("t"), col("b.bucket").as("bucket"))

      val cand = buckets.alias("x")
        .join(buckets.alias("y").hint("shuffle_hash"),
          col("x.t") === col("y.t") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("c_id"))
        .distinct()

      cand
        .join(e.select(col("vec_id").as("q_id"), col("vd").as("qv"),
                       col("nrm").as("qnrm")), "q_id")
        .join(e.select(col("vec_id").as("c_id"), col("vd").as("cv"),
                       col("nrm").as("cnrm")), "c_id")
        .withColumn("sim", round(dot("qv", "cv") / (col("qnrm") * col("cnrm")), 6))
        .groupBy(col("q_id"))
        .agg(max_by(struct(col("c_id").as("nn_id"), col("sim")),
                    struct(col("sim"), -col("c_id"))).as("m"))
        .select(col("q_id"), col("m.nn_id").as("nn_id"), col("m.sim").as("sim"))
    },
    None)

  def all: Seq[Q] = Seq(cosineTopk, cosineKnn, nearDupPairs, annSrp)
}
