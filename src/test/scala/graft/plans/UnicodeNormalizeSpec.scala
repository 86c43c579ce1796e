package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnicodeNormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val decomposed = "café"      // e + combining acute
  private val precomposed = "caf\u00e9"    // é precomposed
  private val ligature = "ﬁle"          // ﬁ ligature + "le"

  test("NFC composes decomposed sequences; NFKC additionally folds " +
      "compatibility forms; ASCII passes through") {
    val df = Seq(decomposed, precomposed, ligature, "plain ascii", "")
      .toDF("t")
    val out = df.select(
      UnicodeNormalize.nfc(col("t")).as("nfc"),
      UnicodeNormalize.nfkc(col("t")).as("nfkc")).as[(String, String)]
      .collect().toSeq
    assert(out(0) == ((precomposed, precomposed)), "NFC composes e+U+0301")
    assert(out(1) == ((precomposed, precomposed)), "already-NFC unchanged")
    assert(out(2)._1 == ligature, "NFC keeps the fi ligature")
    assert(out(2)._2 == "file", "NFKC folds the fi ligature")
    assert(out(3) == (("plain ascii", "plain ascii")))
    assert(out(4) == (("", "")))
  }

  test("codegen and interpreted paths agree; nulls propagate") {
    val df = Seq(Some(decomposed), None, Some(ligature)).toDF("t")
    val q = df.select(UnicodeNormalize.nfc(col("t")).as("n"))
    val viaCodegen = q.collect().map(r => Option(r.getString(0))).toSeq
    val saved = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaInterp = q.collect().map(r => Option(r.getString(0))).toSeq
      assert(viaCodegen == viaInterp)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", saved)
    assert(viaCodegen == Seq(Some(precomposed), None, Some(ligature)))
  }

  test("canonicalization makes exact-dedup signatures agree on visually " +
      "identical text") {
    val df = Seq((1L, s"the $decomposed menu"), (2L, s"the $precomposed menu"))
      .toDF("doc_id", "text")
    val raw = df.select(md5(col("text"))).distinct().count()
    val norm = df.select(md5(UnicodeNormalize.nfc(col("text"))))
      .distinct().count()
    assert(raw == 2L, "un-normalized forms hash apart")
    assert(norm == 1L, "normalized forms hash together")
  }
}
