package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Fixed-grid lerp resampling (`Resample.lerpGrid`): exact integer
  * interpolation values, tick-on-sample exactness, truncation-toward-zero
  * on negative slopes, per-key grid bounds, and the collision-min rule.
  */
class ResampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(samples: Seq[(Long, Long, Long)], period: Long)
      : Map[(Long, Long), Long] = {
    val df = samples.toDF("k", "t", "v")
    Resample.lerpGrid(df, "k", "t", "v", period)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
  }

  test("linear segment evaluated exactly on interior ticks; endpoints " +
      "return the samples themselves") {
    val got = run(Seq((1L, 0L, 0L), (1L, 100L, 10L)), 25L)
    assert(got == Map(
      (1L, 0L) -> 0L, (1L, 25L) -> 2L, (1L, 50L) -> 5L,
      (1L, 75L) -> 7L, (1L, 100L) -> 10L))
  }

  test("negative slope truncates toward zero (Spark div == DuckDB //), " +
      "not toward negative infinity") {
    val got = run(Seq((1L, 0L, 0L), (1L, 100L, -10L)), 25L)
    assert(got((1L, 25L)) == -2L, s"got ${got((1L, 25L))}") // -2.5 -> -2
    assert(got((1L, 75L)) == -7L)
  }

  test("a tick landing on a sample returns that sample exactly, " +
      "independent of the neighbors") {
    val got = run(Seq((1L, 0L, 100L), (1L, 50L, 7L), (1L, 100L, 900L)), 50L)
    assert(got((1L, 50L)) == 7L)
  }

  test("grid is bounded per key: ceil(min)/floor(max) alignment, and a " +
      "key spanning less than one period with no aligned tick is absent") {
    val got = run(Seq(
      (1L, 30L, 1L), (1L, 170L, 15L),  // ticks 100 only (ceil 100, floor 100)
      (2L, 101L, 5L), (2L, 199L, 9L)), // no multiple of 100 inside
      100L)
    assert(got.keySet == Set((1L, 100L)))
    assert(got((1L, 100L)) == 1L + (15L - 1L) * (100L - 30L) / (170L - 30L))
  }

  test("colliding samples at one (key, ts) collapse to the MIN value " +
      "before interpolation") {
    val got = run(Seq((1L, 0L, 8L), (1L, 0L, 2L), (1L, 100L, 2L)), 50L)
    assert(got((1L, 0L)) == 2L)
    assert(got((1L, 50L)) == 2L)
  }

  test("negative (pre-1970) timestamps align the grid inside the span: " +
      "pmod ceil/floor, no out-of-span ticks, no dropped in-span ticks") {
    // span [-170, -30]: true ceil(-170/100)*100 = -100 is the ONLY
    // multiple of 100 inside; truncating `div` alignment would have
    // produced g0 = -100, g1 = 0 — an out-of-span tick at 0 with null
    // neighbors and (for [-230,-130]) a dropped in-span tick at -200
    val got = run(Seq((1L, -170L, 1L), (1L, -30L, 15L)), 100L)
    assert(got.keySet == Set((1L, -100L)))
    assert(got((1L, -100L)) == 1L + (15L - 1L) * (-100L + 170L) / (-30L + 170L))
    // a fully negative span whose bounds ARE multiples: both endpoints
    // tick, interior lerps exactly
    val got2 = run(Seq((2L, -200L, 0L), (2L, -100L, 10L)), 50L)
    assert(got2 == Map((2L, -200L) -> 0L, (2L, -150L) -> 5L,
      (2L, -100L) -> 10L))
    // straddling zero: ticks at every multiple across the sign change
    val got3 = run(Seq((3L, -75L, 0L), (3L, 75L, 30L)), 50L)
    assert(got3 == Map((3L, -50L) -> 5L, (3L, 0L) -> 15L, (3L, 50L) -> 25L))
  }

  test("keys resample independently on their own spans") {
    val got = run(Seq(
      (1L, 0L, 0L), (1L, 200L, 20L),
      (2L, 100L, 50L), (2L, 300L, 10L)), 100L)
    assert(got == Map(
      (1L, 0L) -> 0L, (1L, 100L) -> 10L, (1L, 200L) -> 20L,
      (2L, 100L) -> 50L, (2L, 200L) -> 30L, (2L, 300L) -> 10L))
  }
}
