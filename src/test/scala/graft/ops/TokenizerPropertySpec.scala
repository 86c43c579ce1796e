package graft.ops

import scala.collection.mutable
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Randomized differentials for the tokenizer trainers (the
  * TcpStructSource 200-packet-differential methodology): `WordPiece.train`
  * against an independent driver-side reference trainer (Scala
  * collections + BigInt scores, no Spark, no delimited strings), and the
  * coverage invariant `qt_unigram_encode` relies on — every train word
  * stays Viterbi-segmentable under the trained vocabulary without an
  * unknown floor (each round's chosen pieces survive to the next round's
  * vocab by construction, so the prior round's path always remains
  * available).
  */
class TokenizerPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent WordPiece reference: symbol vectors (not delimited
    * strings), BigInt score arithmetic, explicit left-to-right
    * non-overlapping merge application.
    */
  private def refTrain(words: Seq[(String, Long)],
      rounds: Int): Seq[(String, String, Long, BigInt)] = {
    var segs = words.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = mutable.Buffer.empty[(String, String, Long, BigInt)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val symCnt = mutable.Map.empty[String, Long].withDefaultValue(0L)
      val pairCnt = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((sy, c) <- segs) {
        sy.foreach(s => symCnt(s) += c)
        sy.sliding(2).foreach {
          case Vector(a, b) => pairCnt((a, b)) += c
          case _ =>
        }
      }
      if (pairCnt.isEmpty) done = true
      else {
        val scored = pairCnt.toSeq.map { case ((a, b), c) =>
          val sp = (BigInt(c) * BigInt(1000000000000L)) /
            (BigInt(symCnt(a)) * BigInt(symCnt(b)))
          (a, b, c, sp)
        }
        val best = scored.minBy { case (a, b, c, sp) => (-sp, -c, a, b) }
        out += best
        val (a, b, _, _) = best
        segs = segs.map { case (sy, c) =>
          val merged = mutable.Buffer.empty[String]
          var i = 0
          while (i < sy.length) {
            if (i + 1 < sy.length && sy(i) == a && sy(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += sy(i); i += 1 }
          }
          (merged.toVector, c)
        }
        r += 1
      }
    }
    out.toSeq
  }

  private def segDf(pairs: Seq[(String, Long)]) =
    pairs.toDF("w", "cnt")
      .select(regexp_replace(col("w"), "(.)", "|$1|").as("seg"), col("cnt"))

  test("WordPiece.train matches the independent reference on 25 random " +
      "word tables (2 rounds each)") {
    val rnd = new Random(4217)
    for (case_ <- 1 to 25) {
      val words = (1 to 8).map { _ =>
        val len = 1 + rnd.nextInt(6)
        val w = (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        w -> (1L + rnd.nextInt(9))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      val expected = refTrain(words, 2)
        .map { case (a, b, c, sp) => (a, b, c, sp.toLong) }
      val (got, fin) = WordPiece.train(segDf(words), 2)
      fin.unpersist()
      assert(got.map(m => (m.a, m.b, m.pairCount, m.scorePico)) == expected,
        s"case $case_ diverged on words=$words")
    }
  }

  /** Independent Viterbi reference: plain arrays, explicit candidate
    * order k = 1..maxPiece with first-maximum (shortest-piece) wins —
    * the tie-break the HOF encodes as a reduce over a when-chain.
    */
  private def refViterbi(word: String, probs: Map[String, Long],
      maxPiece: Int = 4): Option[String] = {
    val n = word.length
    val score = new Array[Double](n + 1)
    val path = new Array[String](n + 1)
    score(0) = 1.0; path(0) = ""
    for (i <- 1 to n) {
      var best: Option[(Double, String)] = None
      for (k <- 1 to maxPiece if k <= i && path(i - k) != null) {
        val piece = word.substring(i - k, i)
        probs.get(piece).foreach { p =>
          val s = score(i - k) * (p.toDouble / 1000000.0d)
          // strict > : the FIRST maximum (smallest k) wins exact ties
          if (best.forall(_._1 < s))
            best = Some((s, path(i - k) + "|" + piece + "|"))
        }
      }
      best match {
        case Some((s, p)) => score(i) = s; path(i) = p
        case None => path(i) = null
      }
    }
    Option(path(n))
  }

  test("viterbiPath matches the independent array-DP reference on 200 " +
      "random (word, vocab) cases — scores, paths, ties, dead ends") {
    val rnd = new Random(7781)
    val cases = (1 to 200).map { _ =>
      val len = 1 + rnd.nextInt(8)
      val w = (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      // random vocab over the same alphabet: pieces of length 1-4 with
      // COARSE micro probs (multiples of 125000) to force exact ties;
      // single chars included only sometimes so dead ends occur
      val pieces = (1 to 6).map { _ =>
        val pl = 1 + rnd.nextInt(4)
        (1 to pl).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      } ++ (if (rnd.nextBoolean()) Seq("a", "b", "c") else Seq("a"))
      val vocab = pieces.distinct
        .map(p => p -> (125000L * (1 + rnd.nextInt(8)))).toMap
      (w, vocab)
    }
    val expected = cases.map { case (w, v) => refViterbi(w, v) }
    val got = cases.zipWithIndex.map { case ((w, v), i) =>
      val r = Seq(Tuple1(w)).toDF("w")
        .select(UnigramLm.viterbiPath(col("w"), v).as("p"))
        .collect().head
      (i, if (r.isNullAt(0)) None else Some(r.getString(0)))
    }
    got.foreach { case (i, g) =>
      assert(g == expected(i),
        s"case $i diverged: word=${cases(i)._1} vocab=${cases(i)._2}")
    }
  }

  test("unigram coverage invariant: every train word Viterbi-segments " +
      "under the trained vocab with NO unknown floor (10 random corpora)") {
    val rnd = new Random(93)
    for (case_ <- 1 to 10) {
      val words = (1 to 12).map { _ =>
        val len = 1 + rnd.nextInt(7)
        val w = (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
        w -> (1L + rnd.nextInt(5))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      val wdf = words.toDF("w", "cnt")
      val m = UnigramLm.train(wdf, rounds = 2, vocabSize = 8)
      val nulls = wdf
        .select(UnigramLm.viterbiPath(col("w"), m.probs).as("p"))
        .filter(col("p").isNull).count()
      assert(nulls == 0L, s"case $case_: unsegmentable train words exist")
    }
  }
}
