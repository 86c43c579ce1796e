package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Nearest as-of join (`AsOfJoin.nearest`): hand-walked cases for
  * past-closer, future-closer, the past-wins tie, one-sided matches,
  * and the no-match key.
  */
class AsOfNearestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("picks the closer side; ties prefer the past; one-sided and " +
      "no-match keys degrade to null") {
    val left = Seq(
      (1L, 1L, 100L), // past at 90 (d=10), future at 150 (d=50) -> past
      (2L, 1L, 140L), // past at 90 (d=50), future at 150 (d=10) -> future
      (3L, 1L, 120L), // past at 90 (d=30), future at 150 (d=30) -> tie: past
      (4L, 2L, 50L),  // only future at 70 -> future
      (5L, 3L, 10L)   // key with no right rows -> nulls
    ).toDF("event_id", "k", "us")
    val right = Seq(
      (1L, 90L, 901L), (1L, 150L, 902L), (2L, 70L, 903L)
    ).toDF("k", "us", "pid")
    val out = AsOfJoin.nearest(left, right, key = "k", ts = "us",
        payload = Seq("us", "pid"), tsPayload = "us")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("nearest_pid"))) None
         else Some(r.getLong(r.fieldIndex("nearest_pid"))))).toMap
    assert(out(1L) == Some(901L), "past closer")
    assert(out(2L) == Some(902L), "future closer")
    assert(out(3L) == Some(901L), "tie prefers the past")
    assert(out(4L) == Some(903L), "one-sided future")
    assert(out(5L) == None, "no right rows for the key")
  }

  test("strictness: a right row AT the left timestamp matches neither " +
      "side; payload missing the ts column throws") {
    val left = Seq((1L, 1L, 100L)).toDF("event_id", "k", "us")
    val right = Seq((1L, 100L, 900L)).toDF("k", "us", "pid")
    val out = AsOfJoin.nearest(left, right, "k", "us",
      Seq("us", "pid"), "us").collect()(0)
    assert(out.isNullAt(out.fieldIndex("nearest_pid")))
    intercept[IllegalArgumentException] {
      AsOfJoin.nearest(left, right, "k", "us", Seq("pid"), "us")
    }
  }
}
