package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the batch multi-query ANN contract ([[Similarity.lshTopKBatch]],
  * [[Similarity.ivfTopKBatch]] and their partitioned-layout twins):
  *
  *  1. IDENTITY — batch(Q) restricted to one query equals the single-query
  *     entry point for every query in the set (same candidates, scores,
  *     order), so a caller can switch APIs without a result shift;
  *  2. ONE SCAN — the whole query set is answered by ONE scan of the
  *     corpus/layout (no per-query jobs): asserted as exactly one
  *     FileSourceScan of the layout in the partitioned plans, carrying a
  *     partition filter whose selected directories cover only the probe
  *     union;
  *  3. the broadcast guard keeps the probe relation broadcast for small
  *     query sets and demotes to shuffle above the threshold without
  *     changing results.
  */
class BatchAnnSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private val Dims = 64
  private val K = 10

  private lazy val emb = {
    val rnd = new scala.util.Random(20260814)
    val rows = (0 until 20).flatMap { c =>
      val center = Array.fill(Dims)(rnd.nextFloat() - 0.5f)
      (0 until 25).map { m =>
        val v = center.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f)
        ((c * 25 + m).toLong, v.toSeq)
      }
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  // one query per cluster — diverse buckets/centroids
  private val queryIds = (0 until 10).map(_ * 25L + 3)
  private lazy val queries =
    Similarity.batchQueries(emb, col("vec_id").isin(queryIds: _*))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select("vec_id", "score").as[(Long, Double)].collect().toSeq

  private def batchSlice(batch: org.apache.spark.sql.DataFrame,
      q: Long): Seq[(Long, Double)] =
    batch.filter(col("query_id") === q)
      .orderBy(col("score").desc, col("vec_id"))
      .select("vec_id", "score").as[(Long, Double)].collect().toSeq

  test("lshTopKBatch == N x lshMultiProbeTopK, row for row") {
    val batch = Similarity.lshTopKBatch(emb, queries, K).cache()
    try {
      assert(batch.select("query_id").distinct().count() == queryIds.size)
      queryIds.foreach { q =>
        val single = rows(Similarity.lshMultiProbeTopK(emb, q, K))
        assert(batchSlice(batch, q) == single,
          s"batch and single-query LSH diverge for query $q")
      }
    } finally batch.unpersist()
  }

  test("ivfTopKBatch == N x ivfMultiProbeTopK, row for row") {
    val batch = Similarity.ivfTopKBatch(emb, queries, K).cache()
    try {
      queryIds.foreach { q =>
        val single = rows(Similarity.ivfMultiProbeTopK(emb, q, K))
        assert(batchSlice(batch, q) == single,
          s"batch and single-query IVF diverge for query $q")
      }
    } finally batch.unpersist()
  }

  /** Exactly one scan of the layout, carrying a partition filter, touching
    * no more directories than the probe union — the no-per-query-jobs
    * property in plan form.
    */
  /** Collect FileSourceScans through AQE wrappers: the batch plans contain
    * a window (shuffle), so the root is an AdaptiveSparkPlanExec whose
    * children only appear via its current physical plan and materialized
    * query stages.
    */
  private def scansOf(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansOf(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansOf(q.plan)
    }.flatten

  private def assertOnePrunedScan(df: org.apache.spark.sql.DataFrame,
      partCol: String, maxParts: Int): Unit = {
    df.collect() // finalize the adaptive plan before inspecting it
    val scans = scansOf(df.queryExecution.executedPlan)
    assert(scans.length == 1,
      s"expected ONE layout scan for the whole query set, found ${scans.length}:\n" +
        df.queryExecution.executedPlan)
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == partCol)),
      s"layout scan carries no $partCol partition filter:\n$scan")
    val n = scan.selectedPartitions.partitionCount
    assert(n <= maxParts,
      s"scan touches $n partition directories, expected <= $maxParts")
  }

  test("lshTopKBatchPartitioned: identity with the full-scan batch, ONE " +
      "pruned scan for the whole query set") {
    val path = java.nio.file.Files.createTempDirectory("batch_lsh").toString
    Similarity.writeLshPartitioned(emb, path)
    val part = Similarity.lshTopKBatchPartitioned(spark, path, queries, K)
    val full = Similarity.lshTopKBatch(emb, queries, K)
    assert(
      part.orderBy(col("query_id"), col("score").desc, col("vec_id")).collect().toSeq ==
      full.orderBy(col("query_id"), col("score").desc, col("vec_id")).collect().toSeq,
      "partitioned and full-scan batch LSH diverge")
    // 10 queries x C(6,<=1)=7 probes, <= 64 buckets; dedup makes it < 70
    assertOnePrunedScan(part, "bucket", maxParts = 64)
  }

  test("ivfTopKBatchPartitioned: identity with the full-scan batch, ONE " +
      "pruned scan of only the probed inverted lists") {
    val path = java.nio.file.Files.createTempDirectory("batch_ivf").toString
    Similarity.writeIvfPartitioned(emb, path)
    val part = Similarity.ivfTopKBatchPartitioned(spark, path, queries, K)
    val full = Similarity.ivfTopKBatch(emb, queries, K)
    assert(
      part.orderBy(col("query_id"), col("score").desc, col("vec_id")).collect().toSeq ==
      full.orderBy(col("query_id"), col("score").desc, col("vec_id")).collect().toSeq,
      "partitioned and full-scan batch IVF diverge")
    // probe union over 10 queries at nprobe=2 — at most 16 centroid dirs,
    // and no more than 10*2 distinct
    assertOnePrunedScan(part, "cent_id", maxParts = 16)
  }

  test("ivfPqTopKBatch == N x ivfPqTopKPruned, row for row; ONE pruned " +
      "scan of the compressed layout for the whole set") {
    val path = java.nio.file.Files.createTempDirectory("batch_ivfpq").toString
    Similarity.writeIvfPq(emb, path, stride = 29L)
    val batch = Similarity.ivfPqTopKBatch(spark, path, queries, K).cache()
    try {
      assert(batch.select("query_id").distinct().count() == queryIds.size)
      val qvs = emb.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
        .as[(Long, Seq[Long])].collect().toMap
      queryIds.foreach { q =>
        val single = rows(Similarity.ivfPqTopKPruned(spark, path, qvs(q), q, K))
        assert(batchSlice(batch, q) == single,
          s"batch IVF+PQ diverges from single-query ADC for query $q")
      }
      // plan assertion on an UNCACHED build — InMemoryTableScan would
      // hide the FileSourceScan the assertion looks for
      assertOnePrunedScan(
        Similarity.ivfPqTopKBatch(spark, path, queries, K),
        "cent_id", maxParts = 16)
    } finally { batch.unpersist(); () }
  }

  test("mrrAtK: first-hit reciprocal in micro-units; no-hit queries " +
      "surface with rank NULL / rr 0") {
    val approx = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7), // truth at rank 2
      (2L, 20L, 0.9), (2L, 21L, 0.8), // no hit
      (3L, 30L, 0.5), (3L, 31L, 0.4), (3L, 32L, 0.3) // hits at ranks 1, 3
    ).toDF("query_id", "vec_id", "score")
    val truth = Seq((1L, 11L), (1L, 99L), (2L, 98L), (3L, 30L), (3L, 32L))
      .toDF("query_id", "vec_id")
    val got = Similarity.mrrAtK(approx, truth).orderBy("query_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 500000L), (2L, -1L, 0L), (3L, 1L, 1000000L)))
  }

  test("hardNegatives: disjoint from exact positives, subset of the PQ " +
      "shortlist, bounded per query") {
    val negs = Similarity.hardNegatives(emb, queries, kPos = 5, nNeg = 5,
      stride = 29L)
    val truth = Similarity.bruteForceTopKBatch(emb, queries, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val shortlist = Similarity.pqTopKBatch(emb, queries, 10, stride = 29L)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val n = negs.select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(n.nonEmpty)
    assert(n.toSet.intersect(truth).isEmpty, "a positive leaked into negatives")
    assert(n.toSet.subsetOf(shortlist), "negative outside retriever shortlist")
    assert(n.groupBy(_._1).values.forall(_.length <= 5))
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(emb, queries, kPos = 0, nNeg = 5)
    }
  }

  test("trained-codebook batch IVF at nprobe=1 == N x ivfKmeansTopK") {
    // a query's assigned centroid IS its argmax-cosine centroid, so the
    // single-probe batch must reproduce the single-query trained path
    val cb = Similarity.kmeansCodebook(emb, 8, 2)
    val batch = Similarity.ivfTopKBatch(emb, queries, K,
      centroids = 8, nprobe = 1, codebook = Some(cb)).cache()
    try {
      queryIds.foreach { q =>
        val single = rows(Similarity.ivfKmeansTopK(emb, q, K))
        assert(batchSlice(batch, q) == single,
          s"trained batch and ivfKmeansTopK diverge for query $q")
      }
    } finally batch.unpersist()
  }

  test("bruteForceTopKBatch == N x bruteForceTopK; recallAtK closes the " +
      "loop (self-recall 1.0, approx recall in [0,1] and matches manual)") {
    val truth = Similarity.bruteForceTopKBatch(emb, queries, K).cache()
    try {
      queryIds.foreach { q =>
        val single = rows(Similarity.bruteForceTopK(emb, q, K))
        assert(batchSlice(truth, q) == single,
          s"batch and single-query brute force diverge for query $q")
      }
      // recall of the truth against itself is exactly 1.0 per query
      val self = Similarity.recallAtK(truth, truth)
        .select("recall").as[Double].collect()
      assert(self.length == queryIds.size && self.forall(_ == 1.0))
      // approx recall matches the hand-computed set intersection
      val approx = Similarity.lshTopKBatch(emb, queries, K).cache()
      try {
        val got = Similarity.recallAtK(approx, truth)
          .select("query_id", "recall").as[(Long, Double)].collect().toMap
        queryIds.foreach { q =>
          val t = batchSlice(truth, q).map(_._1).toSet
          val a = batchSlice(approx, q).map(_._1).toSet
          assert(got(q) == t.intersect(a).size.toDouble / t.size,
            s"recall mismatch for query $q")
        }
      } finally approx.unpersist()
    } finally truth.unpersist()
  }

  /** All joins through AQE wrappers. */
  private def joinsOf(plan: org.apache.spark.sql.execution.SparkPlan)
      : (Int, Int) = {
    var bhj = 0; var smj = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p.foreach {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => bhj += 1
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => smj += 1
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case _ =>
    }
    walk(plan)
    (bhj, smj)
  }

  test("small query sets broadcast the probe side: no sort-merge join " +
      "touches the corpus in the batch plans") {
    Seq(
      Similarity.lshTopKBatch(emb, queries, K),
      Similarity.ivfTopKBatch(emb, queries, K)
    ).foreach { df =>
      df.collect()
      val (bhj, smj) = joinsOf(df.queryExecution.executedPlan)
      assert(bhj >= 1 && smj == 0,
        s"expected broadcast-only joins, got bhj=$bhj smj=$smj:\n" +
          df.queryExecution.executedPlan)
    }
  }

  test("broadcast guard: demoting the probe side to a shuffle join does not " +
      "change results") {
    val guarded = Similarity.lshTopKBatch(emb, queries, K,
      maxBroadcastQueries = 0L) // force the shuffle path
    val normal = Similarity.lshTopKBatch(emb, queries, K)
    assert(
      guarded.orderBy(col("query_id"), col("score").desc, col("vec_id")).collect().toSeq ==
      normal.orderBy(col("query_id"), col("score").desc, col("vec_id")).collect().toSeq,
      "shuffle-join fallback changed batch results")
  }

  test("pqTopKBatch == N x pqTopK on the approximate score, row for row") {
    val batch = Similarity.pqTopKBatch(emb, queries, K, stride = 31L).cache()
    try {
      assert(batch.select("query_id").distinct().count() == queryIds.size)
      queryIds.foreach { q =>
        val single = Similarity.pqTopK(emb, q, K, stride = 31L)
          .select(col("vec_id"), col("approx_score"))
          .as[(Long, Double)].collect().toSeq
        assert(batchSlice(batch, q) == single,
          s"batch != single for query $q")
      }
    } finally { batch.unpersist(); () }
  }

  test("PQ is a shortlist generator: the true top-10 survives inside the " +
      "PQ top-50 (measured 1.00 strided / 0.90 first-k); direct code-rank " +
      "recall is the coarse 0.37 that motivates the exact rerank") {
    val truth = Similarity.bruteForceTopKBatch(emb, queries, K)
    def recall(stride: Long, shortlist: Int): Double =
      Similarity.recallAtK(
          Similarity.pqTopKBatch(emb, queries, shortlist, stride = stride),
          truth)
        .agg(avg("recall")).as[Double].head()
    val direct = recall(31L, K)
    val shortStrided = recall(31L, 50)
    val shortFirstK = recall(1L, 50) // vec_ids 0..15 all sit in cluster 0
    info(f"PQ direct recall@10: $direct%.3f; true-top-10 containment in " +
      f"top-50: stride-31 $shortStrided%.3f, first-16 $shortFirstK%.3f")
    // 16 centroids per 8-dim subspace cannot rank the top-10 directly on
    // random data — but the 10x shortlist captures the full true top-10,
    // which the exact rerank (the carried score column in pqTopK) then
    // orders. Floors sit just under the measured values.
    assert(shortStrided >= 0.9, s"PQ shortlist containment collapsed: $shortStrided")
    assert(shortStrided > direct,
      "shortlist containment should dominate direct code ranking")
    assert(shortStrided >= shortFirstK,
      s"stride sampling regressed vs one-cluster codebook: " +
        s"$shortStrided < $shortFirstK")
    val approx = Similarity.pqTopKBatch(emb, queries, K, stride = 31L)
    val guarded = Similarity.pqTopKBatch(emb, queries, K, stride = 31L,
      maxBroadcastQueries = 0L)
    assert(
      guarded.orderBy(col("query_id"), col("score").desc, col("vec_id")).collect().toSeq ==
      approx.orderBy(col("query_id"), col("score").desc, col("vec_id")).collect().toSeq,
      "shuffle-join fallback changed batch PQ results")
  }
}
