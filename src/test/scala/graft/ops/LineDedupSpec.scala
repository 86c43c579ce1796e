package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkTestSession

/** Line-boundary segment dedup (`Dedup.lineDedup`): keep-first per
  * distinct trimmed line corpus-wide, newline rebuild, blank-line
  * handling, and the paragraph-mode separator override.
  */
class LineDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], sep: String = "[\\r\\n]+")
      : Map[Long, (String, Long, Long)] = {
    val r = Dedup.lineDedup(docs.toDF("doc_id", "text"), "doc_id", "text", sep)
    try r.as[(Long, String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    finally { r.unpersist(); () }
  }

  test("keep-first across docs at line granularity; indentation does " +
      "not defeat the match (lines are trimmed before hashing)") {
    val got = run(Seq(
      1L -> "a b\nc d",
      2L -> "c d\ne f",        // "c d" already claimed by doc 1
      3L -> "   c d \t \ng"))  // trimmed "c d" also loses
    assert(got(1L) == (("a b\nc d", 2L, 2L)))
    assert(got(2L) == (("e f", 1L, 2L)))
    assert(got(3L) == (("g", 1L, 2L)))
  }

  test("within-doc duplicate lines: first occurrence wins, order is " +
      "preserved in the rebuild") {
    val got = run(Seq(1L -> "l1\nl2\nl1\nl3"))
    assert(got(1L) == (("l1\nl2\nl3", 3L, 4L)))
  }

  test("blank lines neither claim nor count; CRLF and newline runs are " +
      "one boundary") {
    val got = run(Seq(1L -> "x\r\n\r\n\n   \ny", 2L -> "x"))
    assert(got(1L) == (("x\ny", 2L, 2L)), s"got: $got")
    assert(got(2L) == (("", 0L, 1L)), "doc 2's only line lost to doc 1")
  }

  test("a fully-deduped doc keeps its row with empty clean_text (drop " +
      "policy stays the caller's filter)") {
    val got = run(Seq(1L -> "same line", 2L -> "same line"))
    assert(got(1L) == (("same line", 1L, 1L)))
    assert(got(2L) == (("", 0L, 1L)))
  }

  test("paragraph mode: a blank-line separator pattern dedups at " +
      "paragraph granularity, leaving single newlines inside segments") {
    val got = run(Seq(
      1L -> "para one line a\npara one line b\n\npara two",
      2L -> "para one line a\npara one line b\n\npara three"),
      sep = "\\n[ \\t]*\\n+")
    assert(got(1L)._1 == "para one line a\npara one line b\npara two")
    assert(got(2L) == (("para three", 1L, 2L)),
      "doc 2's first paragraph must lose as a UNIT")
  }
}
