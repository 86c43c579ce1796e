package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DropLedgerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 1 = keeper of everything below; 2 exact dup of 1; 3 bow dup of 1
  // (same vocabulary, reordered); 4 near dup of 1 (most shingles shared,
  // different vocabulary set); 5 unrelated; 6 exact dup of 5
  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight again"),
    (2L, "the quick brown fox jumps over the lazy dog tonight again"),
    (3L, "again tonight the lazy dog jumps the quick brown fox over"),
    (4L, "the quick brown fox jumps over the lazy dog yesterday maybe"),
    (5L, "completely different content about spark engines and scala here"),
    (6L, "completely different content about spark engines and scala here"))
    .toDF("doc_id", "text")

  test("tier priority: exact beats bow beats neardup; each dropped doc " +
      "appears exactly once with its tier keeper") {
    val out = Dedup.dropLedger(docs, "doc_id", col("text"))
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(out.map(_._1) == out.map(_._1).distinct, "one row per dropped doc")
    val byId = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(2L) == (("exact", 1L)), "byte-identical dup drops at tier 1")
    assert(byId(6L) == (("exact", 5L)))
    assert(byId(3L) == (("bow", 1L)),
      "reordered same-vocabulary doc drops at tier 2, not as a neardup")
    assert(byId(4L) == (("neardup", 1L)),
      "shingle-similar doc with different vocabulary drops at tier 3")
    assert(!byId.contains(1L) && !byId.contains(5L), "keepers never appear")
  }

  test("survivor filtering: a doc dropped by an earlier tier is invisible " +
      "to later tiers (keeper ids come from survivors)") {
    // 11 exact-dups 10; 12 is a bow-dup of BOTH — its bow keeper must be
    // 10 (the exact tier's survivor), never 11
    val d2 = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "alpha beta gamma delta epsilon zeta"),
      (12L, "zeta epsilon delta gamma beta alpha"))
      .toDF("doc_id", "text")
    val out = Dedup.dropLedger(d2, "doc_id", col("text"))
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((11L, "exact", 10L), (12L, "bow", 10L)))
  }
}
