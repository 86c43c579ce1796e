package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Simpson corpus concentration (`TextAnalysis.simpsonDiversity`):
  * hand-computed pair counts on skewed and uniform corpora.
  */
class SimpsonSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-computed concentration: skewed group vs all-distinct group") {
    val docs = Seq(
      // lang a: tokens x x x y -> counts {x:3, y:1}: N=4,
      // sum_cc = 3*2 + 0 = 6, simpson = 6/12 = 0.5, eff = 12 div 6 = 2
      (1L, "a", "x x x y"),
      // lang b: all distinct: sum_cc = 0, simpson = 0, eff -> null
      (2L, "b", "p q r s")
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.simpsonDiversity(docs, "lang", col("text"))
      .collect()
    val a = out(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 4L &&
      a.getLong(2) == 2L && a.getLong(3) == 6L &&
      a.getDouble(4) == 0.5 && a.getLong(5) == 2L)
    val b = out(1)
    assert(b.getString(0) == "b" && b.getLong(1) == 4L &&
      b.getLong(2) == 4L && b.getLong(3) == 0L && b.getDouble(4) == 0.0 &&
      b.isNullAt(5), "an all-distinct group has no finite inverse Simpson")
  }

  test("a uniform two-type group: simpson = 1/3 and the without-" +
      "replacement inverse is 3") {
    // x x y y: N=4, sum_cc = 2+2 = 4, simpson = 4/12 = 1/3, eff = 3
    val docs = Seq((1L, "u", "x x y y")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.simpsonDiversity(docs, "lang", col("text"))
      .collect()(0)
    assert(r.getLong(3) == 4L && r.getDouble(4) == 1.0 / 3.0 &&
      r.getLong(5) == 3L)
  }
}
