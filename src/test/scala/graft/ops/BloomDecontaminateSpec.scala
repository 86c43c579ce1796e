package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomDecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog today"),
    (3L, "completely different content about spark engines and scala"),
    (4L, "an unrelated benchmark paragraph mentioning nothing shared at all"),
    (5L, "the quick brown fox jumps over the lazy dog tonight"),
    (6L, "spark engines and scala are completely different content about"))
    .toDF("doc_id", "text")

  private def split(evalIds: Long*) = {
    val isEval = col("doc_id").isin(evalIds.map(Long.box): _*)
    val ev = Dedup.shingleHashes(docs.filter(isEval), "doc_id", col("text"))
      .select("sh")
    val tr = Dedup.shingleHashes(docs.filter(!isEval), "doc_id", col("text"))
    (tr, ev)
  }

  test("result is identical to the plain exact join") {
    val (tr, ev) = split(1L, 3L)
    val viaBloom = Dedup.bloomDecontaminate(tr, ev, "doc_id")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val viaJoin = tr.join(ev.distinct(), "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(viaBloom == viaJoin)
    assert(viaBloom.map(_._1).toSet == Set(2L, 5L, 6L),
      "near/exact dup of eval docs contaminated; unrelated doc 4 clean")
  }

  test("confirm join removes false positives even from a saturated bloom") {
    // 64 bits for dozens of keys: essentially every probe is a bloom hit,
    // so correctness must come entirely from the confirm join
    val (tr, ev) = split(1L)
    val out = Dedup.bloomDecontaminate(tr, ev, "doc_id",
        expectedEvalKeys = 4, numBits = 64)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val exact = tr.join(ev.distinct(), "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(out == exact)
  }

  test("empty eval set yields an empty result with the output schema") {
    val (tr, ev) = split() // no eval docs
    val out = Dedup.bloomDecontaminate(tr, ev, "doc_id")
    assert(out.columns.toSeq == Seq("doc_id", "n_hits"))
    assert(out.count() == 0L)
  }

  private def splitWithIds(evalIds: Long*) = {
    val isEval = col("doc_id").isin(evalIds.map(Long.box): _*)
    (Dedup.shingleHashes(docs.filter(!isEval), "doc_id", col("text")),
      Dedup.shingleHashes(docs.filter(isEval), "doc_id", col("text")))
  }

  test("leakageReport: fractions match a per-doc shingle-set computation") {
    val (tr, ev) = splitWithIds(1L, 3L)
    val got = Dedup.leakageReport(tr, ev, "doc_id")
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_leaked", "leak_frac")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // independent reference: distinct shingle sets per doc, computed on
    // the driver from the same tokenization
    def shingles(s: String): Set[String] = {
      val t = s.trim.split("\\s+").toSeq
      t.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }
    val texts = docs.as[(Long, String)].collect().toMap
    val trainSh = (texts.keySet -- Set(1L, 3L)).flatMap(i => shingles(texts(i)))
    val expected = Seq(1L, 3L).map { id =>
      val sh = shingles(texts(id))
      val leaked = sh.count(trainSh.contains)
      (id, sh.size.toLong, leaked.toLong, leaked.toDouble / sh.size)
    }
    assert(got == expected)
    assert(got.exists(r => r._4 > 0.0 && r._4 < 1.0) || got.exists(_._4 == 1.0),
      "fixture must exercise a nontrivial leak fraction")
  }

  test("leakageReport plan: train relation never hash-shuffles for a join") {
    val (tr, ev) = splitWithIds(1L)
    val plan = Dedup.leakageReport(tr, ev, "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"train side must only meet broadcast joins:\n$plan")
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("plan: might_contain literal filter below a broadcast confirm join") {
    val (tr, ev) = split(1L)
    val out = Dedup.bloomDecontaminate(tr, ev, "doc_id")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom filter missing from plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "confirm join must broadcast")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"train relation must never hash-shuffle for a join:\n$plan")
  }
}
