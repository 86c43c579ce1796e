package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Deterministic sketches (`Sketches`): Count-Min audited against a
  * brute-force register replay (collisions forced by a narrow width),
  * KMV against a brute-force k-th-smallest-hash computation, plus the
  * under-filled-sketch and one-sided-error contracts.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The repo hash (TextAnalysis.md5Long) recomputed independently. */
  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map("%02x".format(_)).mkString.substring(0, 15), 16)
  }

  // deterministic corpus: token tNN appears (NN % 7 + 1) times per doc
  // it lands in; 60 docs, each carrying 8 tokens
  private def corpus: Seq[(Long, String, String)] =
    (0 until 60).map { i =>
      val toks = (0 until 8).flatMap { j =>
        val id = (i * 3 + j * 11) % 40
        Seq.fill(id % 7 + 1)(s"t$id")
      }
      (i.toLong, if (i % 4 == 0) "yy" else "xx", toks.mkString(" "))
    }

  private def docs = corpus.toDF("doc_id", "lang", "text")

  test("cmsAudit matches a brute-force register replay under forced " +
      "collisions, and the error is one-sided") {
    val depth = 3; val width = 16
    val exact: Map[String, Long] = corpus
      .flatMap(_._3.split("\\s+")).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val reg: Map[(Int, Long), Long] = exact.toSeq
      .flatMap { case (t, n) =>
        (0 until depth).map(i => (i, md5Long(s"cms$i:$t")% width) -> n)
      }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val want = exact.map { case (t, n) =>
      t -> (0 until depth)
        .map(i => reg((i, md5Long(s"cms$i:$t") % width))).min
    }
    val got = Sketches.cmsAudit(docs, col("text"), depth, width, k = 40)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.nonEmpty && got.length == math.min(40, exact.size))
    got.foreach { case (t, n, est, over) =>
      assert(n == exact(t), s"exact count of $t")
      assert(est == want(t), s"register replay of $t")
      assert(over == est - n && over >= 0, s"one-sided error of $t")
    }
    // with forced collisions at width 16 SOME token must overcount,
    // or the test has no teeth
    assert(got.exists(_._4 > 0), "expected at least one collision")
    // top-k order: est DESC, tok ASC
    val key = got.map { case (t, _, est, _) => (-est, t) }
    assert(key.sameElements(key.sorted), "top-k ordering")
  }

  test("kmvDistinct: a full sketch reproduces the brute-force k-th " +
      "hash and estimate; an under-filled group reports exact") {
    val k = 64
    // lang xx carries 40 distinct tokens < k (under-filled); widen it
    // with extra docs so xx crosses k while yy stays under
    val extra = (0 until 30).map { i =>
      (1000L + i, "xx", (0 until 4).map(j => s"x${i * 4 + j}").mkString(" "))
    }
    val d2 = (corpus ++ extra).toDF("doc_id", "lang", "text")
    val byLang = (corpus ++ extra).groupBy(_._2).map { case (l, rows) =>
      l -> rows.flatMap(_._3.split("\\s+")).map(md5Long).distinct.sorted
    }
    val out = Sketches.kmvDistinct(d2, "lang", col("text"), k)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    val xx = byLang("xx"); val yy = byLang("yy")
    assert(xx.size > k && yy.size < k, "fixture must straddle k")
    val (exX, kthX, estX, _) = out("xx")
    assert(exX == xx.size && kthX == xx(k - 1))
    assert(estX == (k - 1).toDouble * 1152921504606846976.0 /
      xx(k - 1).toDouble)
    val (exY, kthY, estY, okY) = out("yy")
    assert(exY == yy.size && kthY == -1L && estY == yy.size.toDouble)
    assert(okY, "an exact estimate is inside any RSD band")
  }
}
