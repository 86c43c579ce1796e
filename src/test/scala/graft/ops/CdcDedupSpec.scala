package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Content-defined-chunking dedup (`Dedup.cdcSegmentDedup`): the
  * shift-robustness property that motivates CDC over fixed windows
  * (head-to-head against `segmentDedup`), keep-first winner order,
  * boundary/rebuild mechanics, and the trailing-boundary edge.
  *
  * Boundary tokens are DISCOVERED at runtime (a token is a boundary iff
  * `md5Long(tok) % d == 0` — deterministic but opaque), so the fixtures
  * are assembled from probed boundary/non-boundary vocabularies rather
  * than hand-picked strings.
  */
class CdcDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val D = 4L

  // probe a small vocabulary once: which tokens close a segment at d=4
  private lazy val (bTok, nToks) = {
    val cand = (('a' to 'z') ++ ('A' to 'Z')).map(c => s"w$c")
    val flags = cand.toDF("t")
      .select(col("t"), pmod(TextAnalysis.md5Long(col("t")), lit(D)).as("m"))
      .as[(String, Long)].collect()
    val b = flags.collect { case (t, 0L) => t }
    val n = flags.collect { case (t, m) if m != 0L => t }
    assert(b.nonEmpty && n.size >= 6, s"probe too small: ${flags.toSeq}")
    (b.head, n.take(6).toSeq)
  }

  private def run(rows: Seq[(Long, String)], divisor: Long = D) = {
    val r = Dedup.cdcSegmentDedup(rows.toDF("doc_id", "text"), "doc_id",
      "text", divisor)
    val got = r.orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    r.unpersist()
    got
  }

  test("a duplicated passage dedups fully regardless of a prefix " +
      "insertion; fixed windows misalign and keep the duplicate") {
    val Seq(n1, n2, n3, n4, n5, _) = nToks
    // passage with internal CDC boundaries: |n1 n2 B|n3 n4 B|n5|
    val p = s"$n1 $n2 $bTok $n3 $n4 $bTok $n5"
    // doc 2 = one-token prefix (itself a boundary, so the passage's own
    // segmentation is reproduced verbatim after it) + the same passage
    val docs = Seq(1L -> p, 2L -> s"$bTok $p")
    val got = run(docs)
    assert(got == Seq(
      (1L, p, 3L, 3L),          // doc 1 claims all three segments
      (2L, bTok, 1L, 4L)))      // only the novel prefix survives
    // fixed 3-token windows shift by the insertion: doc 2's windows
    // ([b n1 n2] [B n3 n4] ...) match none of doc 1's ([n1 n2 B] ...),
    // so the duplicated passage survives fixed-window dedup intact
    val fixed = Dedup.segmentDedup(docs.toDF("doc_id", "text"),
      "doc_id", "text", segTokens = 3)
    val kept2 = fixed.filter(col("doc_id") === 2L)
      .select("n_kept").as[Long].head()
    fixed.unpersist()
    assert(kept2 > 1L,
      "fixed windows unexpectedly caught the shifted duplicate")
  }

  test("keep-first is corpus-wide by (doc, position); within one doc a " +
      "repeated segment keeps only its first occurrence") {
    val Seq(n1, n2, _, _, _, _) = nToks
    val seg = s"$n1 $n2 $bTok"             // one full segment
    val got = run(Seq(1L -> s"$seg $seg"))  // repeated back-to-back
    assert(got == Seq((1L, s"$n1 $n2 $bTok", 1L, 2L)))
  }

  test("text ending on a boundary token emits no trailing blank segment") {
    val Seq(n1, _, _, _, _, _) = nToks
    val got = run(Seq(1L -> s"$n1 $bTok"))
    assert(got == Seq((1L, s"$n1 $bTok", 1L, 1L)))
  }

  test("divisor=1 degenerates to token-level dedup") {
    val Seq(n1, n2, _, _, _, _) = nToks
    val got = run(Seq(1L -> s"$n1 $n2 $n1"), divisor = 1L)
    assert(got == Seq((1L, s"$n1 $n2", 2L, 3L)))
  }
}
