package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the streaming containment-decontamination contract
  * ([[Dedup.streamingContainment]]), the [[StreamingDecontaminateSpec]]
  * battery for the asymmetric-overlap operator:
  *
  *  1. MULTI-BATCH EQUALITY — unioned per-batch reports equal batch-mode
  *     [[Dedup.containmentDecontaminate]], and clean = train minus
  *     contaminated exactly;
  *  2. REPLAY IDEMPOTENCE from a fresh checkpoint;
  *  3. [[Dedup.containmentAgainst]] with prepared shingles equals the
  *     self-contained operator.
  */
class StreamingContainmentSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  // eval = ids 0-2 (12-token snippets); train plants each snippet inside
  // 24 tokens of padding (high containment, low Jaccard), one partial
  // overlap, and clean docs
  private def mkDocs: Seq[(Long, String)] = {
    val evalTexts = (0 until 3).map { i =>
      (0 until 12).map(j => s"tok${i}_$j").mkString(" ")
    }
    val eval = evalTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val pad = (0 until 24).map(j => s"pad$j").mkString(" ")
    val planted = evalTexts.zipWithIndex.map { case (t, i) =>
      (100L + i, s"$pad $t")
    }
    val partial = Seq((200L,
      (0 until 6).map(j => s"tok0_$j").mkString(" ") + " " +
        (0 until 6).map(j => s"zz$j").mkString(" ")))
    val clean = (300L until 320L).map { i =>
      (i, (0 until 12).map(j => s"other${i}_$j").mkString(" "))
    }
    eval ++ planted ++ partial ++ clean
  }

  private def report(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.select(col("doc_id"), col("n_eval_hits"), col("max_containment"))
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)

  test("prepared-shingle form equals the self-contained operator, and the " +
      "planted snippets are caught at containment 1.0") {
    val docs = mkDocs.toDF("doc_id", "text")
    val whole = Dedup.containmentDecontaminate(docs, "doc_id", col("text"),
      col("doc_id") < 3)
    val eval = Dedup.prepareEvalShingles(
      docs.filter(col("doc_id") < 3), "doc_id", col("text"))
    try {
      val against = Dedup.containmentAgainst(
        docs.filter(col("doc_id") >= 3), "doc_id", col("text"), eval)
      try {
        assert(report(against) == report(whole))
        assert(report(whole).filter(_._1 >= 100L).filter(_._1 < 200L)
          .forall(_._3 == 1.0))
      } finally against.unpersist()
    } finally { eval.unpersist(); whole.unpersist() }
  }

  test("multi-batch streaming equals the batch operator; clean = train " +
      "minus contaminated; fresh-checkpoint replay is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("scont").toString
    val docs = mkDocs.toDF("doc_id", "text")
    docs.repartition(4).write.parquet(s"$root/src")

    val eval = Dedup.prepareEvalShingles(
      docs.filter(col("doc_id") < 3), "doc_id", col("text"))
    try {
      def runStream(ckpt: String): Unit = {
        val stream = spark.readStream
          .schema(new org.apache.spark.sql.types.StructType()
            .add("doc_id", "long").add("text", "string"))
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$root/src")
          .filter(col("doc_id") >= 3)
        Dedup.streamingContainment(stream, "doc_id", col("text"), eval,
          s"$root/out", ckpt).awaitTermination()
      }
      runStream(s"$root/ckpt1")
      val batchIds = new java.io.File(s"$root/out/contam").listFiles()
        .filter(_.getName.startsWith("batch=")).map(_.getName)
      assert(batchIds.length > 1,
        s"expected multiple micro-batches, got ${batchIds.toSeq}")

      val whole = Dedup.containmentDecontaminate(docs, "doc_id",
        col("text"), col("doc_id") < 3)
      val streamedReport = report(spark.read.parquet(s"$root/out/contam"))
      assert(streamedReport == report(whole),
        "streamed union != batch operator")

      val cleanIds = spark.read.parquet(s"$root/out/clean")
        .select("doc_id").as[Long].collect().toSet
      val contamIds = report(whole).map(_._1).toSet
      val trainIds = mkDocs.map(_._1).filter(_ >= 3L).toSet
      assert(cleanIds == trainIds -- contamIds)
      whole.unpersist()

      runStream(s"$root/ckpt2")
      val replayed = spark.read.parquet(s"$root/out/contam")
      assert(report(replayed) == streamedReport,
        "fresh-checkpoint replay changed the report")
    } finally eval.unpersist()
  }
}
