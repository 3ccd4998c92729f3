package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

import graft.model.Tables

/** Pins the snapshot-memo contracts: [[Tables.cachedRowCount]] (r12
  * verdict task 3) and the exact-kNN ground-truth memo (r13 verdict
  * task 5). Both read through a cache keyed on the table path's
  * filesystem snapshot, so a warm snapshot costs ZERO Spark jobs and a
  * changed file (the staleness hazard a memo introduces) forces a
  * recompute. Each test uses a private temp copy of the sf0.001
  * embeddings table so no other suite can have warmed the key.
  */
class RowCountCacheSpec extends SparkSpec {

  /** The scaffolding both snapshot-memo tests share (review finding —
    * it was copied verbatim): a private temp copy of the embeddings
    * table, an async-DRAINED Spark job counter (listener delivery is
    * async: poll until the count is stable for a full interval, never
    * a single sleep), and teardown. Body receives (tableDir,
    * parquetFile, jobCounter, drained). */
  private def withEmbeddingsCopyAndJobCounter(
      body: (String, Path, java.util.concurrent.atomic.AtomicInteger, () => Int) => Unit)
      : Unit = {
    val tmp = Files.createTempDirectory("graft-snap").toFile
    val dst = Paths.get(tmp.getAbsolutePath, "embeddings.parquet")
    Files.copy(Paths.get(sf, "embeddings.parquet"), dst,
      StandardCopyOption.REPLACE_EXISTING)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    def drained(): Int = {
      var last = -1
      var cur = jobs.get()
      while (cur != last) { Thread.sleep(200); last = cur; cur = jobs.get() }
      cur
    }
    spark.sparkContext.addSparkListener(listener)
    try body(tmp.getAbsolutePath, dst, jobs, () => drained())
    finally {
      spark.sparkContext.removeSparkListener(listener)
      Files.deleteIfExists(dst)
      tmp.delete(): Unit
    }
  }

  test("cachedRowCount: one count job per snapshot, zero on reuse, recount on file change") {
    withEmbeddingsCopyAndJobCounter { (d, dst, jobs, drained) =>
      val expected = spark.read.parquet(dst.toString).count()
      drained()
      jobs.set(0)

      val n1 = Tables.cachedRowCount(spark, d, "embeddings")
      assert(n1 === expected)
      val afterFirst = drained()
      assert(afterFirst >= 1, "cold cache must run a real count job")

      val n2 = Tables.cachedRowCount(spark, d, "embeddings")
      assert(n2 === expected)
      assert(drained() === afterFirst,
        "warm snapshot must cost zero Spark jobs — the memo is the point")

      // staleness: a rewritten file (same path, new mtime) is a NEW
      // snapshot key and must recount, not serve the stale value
      val f = dst.toFile
      assert(f.setLastModified(f.lastModified() + 60000))
      val n3 = Tables.cachedRowCount(spark, d, "embeddings")
      assert(n3 === expected)
      assert(drained() > afterFirst,
        "a changed file snapshot must force a fresh count job")
    }
  }

  test("exactKnnTop1Cached: compute once per snapshot, zero jobs warm, recompute on file change") {
    // the same snapshot-memo contract for the exact-kNN ground truth
    // (r13 verdict task 5): three recall contracts share one compute
    // per (dir, snapshot); results must be IDENTICAL cold vs warm, a
    // warm build costs zero Spark jobs (the rows are driver-resident,
    // bounded by knnQueryIdCap), and a rewritten file recomputes.
    withEmbeddingsCopyAndJobCounter { (d, dst, _, drained) =>
      import graft.queries.Similarity
      val cold = Similarity.exactKnnTop1Cached(spark, d).collect()
        .map(_.toString).sorted
      assert(cold.nonEmpty)
      val afterCold = drained()
      assert(afterCold >= 1, "cold memo must run the real exact-kNN jobs")
      val warm = Similarity.exactKnnTop1Cached(spark, d)
      assert(drained() === afterCold,
        "BUILDING the warm ground-truth frame must cost zero Spark jobs")
      assert(warm.collect().map(_.toString).sorted.toSeq === cold.toSeq,
        "warm rows must be identical to the cold compute")
      val f = dst.toFile
      assert(f.setLastModified(f.lastModified() + 60000))
      val fresh = drained()
      Similarity.exactKnnTop1Cached(spark, d).collect()
      assert(drained() > fresh,
        "a changed file snapshot must force a fresh exact-kNN compute")
    }
  }

  test("exactKnnTop1Cached: concurrent COLD callers pay the compute once (per-dir latch)") {
    // r14 ADVICE: get-then-put had no per-key latch, so the three
    // recall contracts racing a cold dir could EACH run the full
    // exact-kNN crossJoin — the re-derivation the memo exists to kill.
    // Measure a single cold compute's job count on one fresh copy,
    // then race three cold callers on a second fresh copy: the total
    // must match one compute, not three.
    withEmbeddingsCopyAndJobCounter { (d1, _, jobs, drained) =>
      import graft.queries.Similarity
      Similarity.exactKnnTop1Cached(spark, d1).collect()
      val oneCold = drained()
      assert(oneCold >= 1)
      withEmbeddingsCopyAndJobCounter { (d2, _, _, drained2) =>
        jobs.set(0)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration._
        import scala.concurrent.ExecutionContext.Implicits.global
        val rows = Await.result(
          Future.sequence((1 to 3).map(_ => Future(
            Similarity.exactKnnTop1Cached(spark, d2).collect()
              .map(_.toString).sorted.toSeq))),
          5.minutes)
        assert(rows.distinct.size == 1, "racers must observe identical rows")
        val raced = drained2()
        assert(raced <= oneCold + 1,
          s"3 concurrent cold callers ran $raced jobs vs $oneCold for one " +
            "compute — the per-dir latch is not serializing the cold path")
      }
    }
  }
}
