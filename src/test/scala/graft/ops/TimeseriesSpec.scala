package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Keyed time-series analytics (`Timeseries`): duty cycle against a
  * hand-walked trace (open last interval, entry counting, tie order),
  * and the lag co-moment against hand-computed product sums including
  * the shrinking overlap at the grid edge.
  */
class TimeseriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dutyCycle: hand-walked two-user trace — dwell, intervals, " +
      "entries; the last sample of a trace charges nothing") {
    // user 1: low@0 high@10 high@20 low@30; user 2: a lone high@5
    val df = Seq(
      (1L, 0L, 1L, "low"), (1L, 10L, 2L, "high"),
      (1L, 20L, 3L, "high"), (1L, 30L, 4L, "low"),
      (2L, 5L, 5L, "high")
    ).toDF("user_id", "tus", "event_id", "st")
    val out = Timeseries.dutyCycle(df, "user_id", col("tus"), col("st"),
      "event_id").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // low owns [0,10) and [30,..) — the open end charges nothing
    assert(out("low") == ((10L, 1L, 2L)))
    // high owns [10,20) and [20,30); entries: t=10 (transition) and
    // user 2's first sample
    assert(out("high") == ((20L, 2L, 2L)))
  }

  test("dutyCycle: equal timestamps order by the tie column") {
    // two samples at t=10 — tie order (event_id) decides which state
    // owns [10,10) (zero dwell) and which owns [10,30)
    val df = Seq(
      (1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"), (1L, 30L, 3L, "a")
    ).toDF("user_id", "tus", "event_id", "st")
    val out = Timeseries.dutyCycle(df, "user_id", col("tus"), col("st"),
      "event_id").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == ((0L, 1L, 2L)), "a owns the zero-width interval")
    assert(out("b") == ((20L, 1L, 1L)), "b owns [10,30)")
  }

  test("timeWeightedAvg: step-hold integral, floor micro quotient via " +
      "the two-term division; single-sample key reports NULL") {
    // user 1: v=10 holds [0,10), v=20 holds [10,30): integral 500,
    // span 30 -> twa = floor(500e6/30) = 16_666_666
    val df = Seq(
      (1L, 0L, 1L, 10L), (1L, 10L, 2L, 20L), (1L, 30L, 3L, 0L),
      (2L, 5L, 4L, 99L)
    ).toDF("user_id", "tus", "event_id", "v")
    val out = Timeseries.timeWeightedAvg(df, "user_id", col("tus"),
      "event_id", col("v")).collect()
    val u1 = out(0)
    assert(u1.getLong(1) == 3L && u1.getLong(2) == 500L &&
      u1.getLong(3) == 30L && u1.getLong(4) == 16666666L)
    val u2 = out(1)
    assert(u2.getLong(1) == 1L && u2.isNullAt(4),
      "a single sample holds nothing and has no TWA")
  }

  test("onChangeCompression: first sample kept, repeats dropped, " +
      "every change kept; ratio in exact micro-units") {
    // user 1: 5,5,7,7,5 -> kept 5,7,5 = 3 of 5 (600000 micro);
    // user 2: constant -> kept 1 of 4 (250000 micro)
    val df = Seq(
      (1L, 0L, 1L, 5L), (1L, 10L, 2L, 5L), (1L, 20L, 3L, 7L),
      (1L, 30L, 4L, 7L), (1L, 40L, 5L, 5L),
      (2L, 0L, 6L, 9L), (2L, 1L, 7L, 9L), (2L, 2L, 8L, 9L),
      (2L, 3L, 9L, 9L)
    ).toDF("user_id", "tus", "event_id", "v")
    val out = Timeseries.onChangeCompression(df, "user_id", col("tus"),
      "event_id", col("v")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == ((5L, 3L, 600000L)))
    assert(out(2L) == ((4L, 1L, 250000L)))
  }

  test("lagCoMoment: hand-computed product sums; overlap shrinks at " +
      "the grid edge") {
    val a = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("bucket", "v")
    val b = Seq((0L, 10L), (1L, 20L), (2L, 30L), (3L, 40L), (4L, 50L))
      .toDF("bucket", "v")
    val out = Timeseries.lagCoMoment(a, b, maxLag = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0, 300L, 4L), (1, 400L, 4L), (2, 260L, 3L)))
  }

  test("gapReport: max gap, threshold count, and the single-sample " +
      "NULL contract") {
    val df = Seq(
      (1L, 0L, 1L), (1L, 10L, 2L), (1L, 1000L, 3L), // gaps 10, 990
      (2L, 5L, 4L)                                  // lone sample
    ).toDF("user_id", "tus", "event_id")
    val out = Timeseries.gapReport(df, "user_id", col("tus"), "event_id",
      thresholdUs = 100L).collect()
    val u1 = out(0)
    assert(u1.getLong(0) == 1L && u1.getLong(1) == 3L &&
      u1.getLong(2) == 990L && u1.getLong(3) == 1L)
    val u2 = out(1)
    assert(u2.getLong(0) == 2L && u2.getLong(1) == 1L &&
      u2.isNullAt(2) && u2.getLong(3) == 0L)
  }

  test("lagCoMoment: maxLag 0 is the plain co-moment; negative throws") {
    val a = Seq((0L, 2L)).toDF("bucket", "v")
    val b = Seq((0L, 7L)).toDF("bucket", "v")
    val out = Timeseries.lagCoMoment(a, b, 0).collect()
    assert(out.length == 1 && out(0).getLong(1) == 14L)
    intercept[IllegalArgumentException] {
      Timeseries.lagCoMoment(a, b, -1)
    }
  }
}
