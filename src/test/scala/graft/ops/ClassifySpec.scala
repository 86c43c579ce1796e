package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Multinomial NB in exact micro-units (`Classify`): hand-computed
  * Laplace probabilities, unseen-token floor, deterministic label
  * tie-break, and the windowless argmax plan.
  */
class ClassifySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("scores match hand-computed Laplace micro-units; unseen tokens " +
      "hit the per-label floor") {
    // train: A = "x x y" (3 tok), B = "y z" (2 tok); V = 3
    //   priors: 1e6 div 2 = 500000 each
    //   p(A,x) = 3e6 div 6 = 500000; p(A,y) = 2e6 div 6 = 333333
    //   p(B,y) = p(B,z) = 2e6 div 5 = 400000
    //   floors: A = 1e6 div 6 = 166666; B = 1e6 div 5 = 200000
    val train = Seq(("A", "x x y"), ("B", "y z")).toDF("label", "text")
    val test0 = Seq((1L, "x y"), (2L, "q")).toDF("doc_id", "text")
    val model = Classify.nbTrain(train, "label", col("text"))
    val got = Classify.nbClassify(test0, "doc_id", col("text"), model)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    // doc 1: A = 500000 + 500000 + 333333 = 1333333
    //        B = 500000 + 200000 + 400000 = 1100000  -> A
    // doc 2 ("q" unseen everywhere): A = 666666, B = 700000 -> B
    assert(got == Seq((1L, "A", 1333333L), (2L, "B", 700000L)))
  }

  test("score ties break by label ascending") {
    // symmetric training makes "x" score identically under A and B
    val train = Seq(("B", "x z"), ("A", "x y")).toDF("label", "text")
    val model = Classify.nbTrain(train, "label", col("text"))
    val got = Classify.nbClassify(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", col("text"), model)
      .as[(Long, String, Long)].head()
    assert(got == ((1L, "A", 900000L)), s"tie must pick label-min: $got")
  }

  test("token repetition multiplies: tf rides the distinct-token join") {
    val train = Seq(("A", "x x y"), ("B", "y z")).toDF("label", "text")
    val model = Classify.nbTrain(train, "label", col("text"))
    val got = Classify.nbClassify(Seq((1L, "x x x")).toDF("doc_id", "text"),
        "doc_id", col("text"), model)
      .as[(Long, String, Long)].head()
    // A: 500000 + 3*500000 = 2000000; B: 500000 + 3*200000 = 1100000
    assert(got == ((1L, "A", 2000000L)))
  }

  test("nbTrainApply carries actual/correct; blank train docs are " +
      "excluded from priors and counts") {
    val train = Seq(("A", "x x y"), ("A", "   "), ("B", "y z"))
      .toDF("label", "text")
    val test0 = Seq((1L, "x y", "A"), (2L, "q", "A"))
      .toDF("doc_id", "text", "label")
    val got = Classify.nbTrainApply(train, test0, "doc_id", "label",
        col("text"))
      .orderBy("doc_id")
      .select("doc_id", "pred_label", "actual", "correct")
      .as[(Long, String, String, Boolean)].collect().toSeq
    // blank doc ignored -> same model as the first test
    assert(got == Seq((1L, "A", "A", true), (2L, "B", "A", false)))
  }

  test("argmax is a min-struct aggregation — no Window in the plan") {
    val train = Seq(("A", "x x y"), ("B", "y z")).toDF("label", "text")
    val model = Classify.nbTrain(train, "label", col("text"))
    val plan = Classify.nbClassify(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", col("text"), model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"argmax must not window:\n$plan")
  }
}
