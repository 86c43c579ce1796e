package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the streaming fuzzy-decontamination contract
  * ([[Dedup.streamingDecontaminate]]):
  *
  *  1. MULTI-BATCH EQUALITY — with the corpus split across several
  *     micro-batches (maxFilesPerTrigger=1), the unioned contamination
  *     report equals batch-mode [[Dedup.fuzzyDecontaminate]] on the same
  *     train/eval split, and clean = train minus contaminated exactly;
  *  2. REPLAY IDEMPOTENCE — re-running the stream from a fresh checkpoint
  *     into the same output (the worst-case "replay everything" recovery)
  *     overwrites per-batch partitions and yields the identical report;
  *  3. [[Dedup.fuzzyDecontaminateAgainst]] with prepared signatures equals
  *     the self-contained batch operator.
  */
class StreamingDecontaminateSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  // corpus with planted near-dups of the "eval" docs: eval = ids 0-4,
  // train contains exact copies, one-token edits, and unrelated text
  private def mkDocs: Seq[(Long, String)] = {
    val evalTexts = (0 until 5).map { i =>
      (0 until 12).map(j => s"tok${i}_$j").mkString(" ")
    }
    val eval = evalTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val contaminated = evalTexts.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        (100L + i, t),                                    // exact copy
        (200L + i, t.replace(s"tok${i}_3", "edited")))    // near dup
    }
    val clean = (300L until 330L).map { i =>
      (i, (0 until 12).map(j => s"other${i}_$j").mkString(" "))
    }
    eval ++ contaminated ++ clean
  }

  private val isEvalId: Long => Boolean = _ < 5

  private def report(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.select(col("doc_id"), col("n_eval_hits"), col("max_jaccard"))
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)

  test("prepared-signature batch form equals the self-contained operator") {
    val docs = mkDocs.toDF("doc_id", "text")
    val whole = Dedup.fuzzyDecontaminate(docs, "doc_id", col("text"),
      col("doc_id") < 5)
    val eval = Dedup.prepareEvalSignatures(
      docs.filter(col("doc_id") < 5), "doc_id", col("text"))
    try {
      val against = Dedup.fuzzyDecontaminateAgainst(
        docs.filter(col("doc_id") >= 5), "doc_id", col("text"), eval)
      try assert(report(against) == report(whole))
      finally against.unpersist()
    } finally { eval.unpersist(); whole.unpersist() }
  }

  test("multi-batch streaming equals the batch operator; clean = train minus " +
      "contaminated; fresh-checkpoint replay is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("sdecon").toString
    val docs = mkDocs.toDF("doc_id", "text")
    // several source files => several micro-batches at maxFilesPerTrigger=1
    docs.repartition(4).write.parquet(s"$root/src")

    val evalDf = docs.filter(col("doc_id") < 5)
    val eval = Dedup.prepareEvalSignatures(evalDf, "doc_id", col("text"))
    try {
      def runStream(ckpt: String): Unit = {
        val stream = spark.readStream
          .schema(new org.apache.spark.sql.types.StructType()
            .add("doc_id", "long").add("text", "string"))
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$root/src")
          .filter(col("doc_id") >= 5)
        Dedup.streamingDecontaminate(stream, "doc_id", col("text"), eval,
          s"$root/out", ckpt).awaitTermination()
      }
      runStream(s"$root/ckpt1")
      val batchIds = new java.io.File(s"$root/out/contam").listFiles()
        .filter(_.getName.startsWith("batch=")).map(_.getName)
      assert(batchIds.length > 1,
        s"expected multiple micro-batches, got ${batchIds.toSeq}")

      val whole = Dedup.fuzzyDecontaminate(docs, "doc_id", col("text"),
        col("doc_id") < 5)
      // materialize now: the replay below overwrites the files this lazy
      // DataFrame points at
      val streamedReport = report(spark.read.parquet(s"$root/out/contam"))
      assert(streamedReport == report(whole),
        "streamed union != batch operator")

      // clean partitions hold exactly train - contaminated
      val cleanIds = spark.read.parquet(s"$root/out/clean")
        .select("doc_id").as[Long].collect().toSet
      val contamIds = report(whole).map(_._1).toSet
      val trainIds = mkDocs.map(_._1).filterNot(isEvalId).toSet
      assert(cleanIds == trainIds -- contamIds)
      whole.unpersist()

      // worst-case recovery: replay EVERYTHING from a fresh checkpoint into
      // the same out dir — partition overwrite keeps the result identical
      runStream(s"$root/ckpt2")
      val replayed = spark.read.parquet(s"$root/out/contam")
      assert(report(replayed) == streamedReport,
        "fresh-checkpoint replay changed the report")
    } finally eval.unpersist()
  }
}
