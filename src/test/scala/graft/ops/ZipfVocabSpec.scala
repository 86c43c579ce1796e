package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Zipf-tailed vocabulary robustness fixture: every text operator that
  * runs green on the driver corpus runs there over a ~31-word
  * vocabulary (3-shingles rescue set-similarity ops on that shape — the
  * recorded word-prefix lesson). This suite re-runs the operators whose
  * scale contracts LEAN on vocabulary breadth — the prefix-filter join
  * (rare-prefix fan-out), Dice collocations (bigram/unigram ratios),
  * the NB classifier (per-token likelihoods), and all three tokenizer
  * trainers (merge/EM over the distinct-word table) — on a GENERATED
  * corpus with 10⁴+ distinct alphabetic words drawn from a Zipf(1)
  * rank-frequency law, to confirm none hides a small-vocab assumption.
  *
  * The generator is fully deterministic (fixed-seed LCG, base-26 word
  * spelling), so every assertion is exact and replayable.
  */
object ZipfFixture {
  val V = 30000          // base Zipf vocabulary size
  val Docs = 900
  val DocLen = 70        // Zipf-sampled tokens per doc
  val UniquePerDoc = 12  // doc-unique tail words (guarantee 10⁴+ distinct)
  val Twins = 30         // planted near-dup pairs for the prefix join

  /** Injective alphabetic spelling of a rank: base-26 digits mapped to
    * 'a'..'z' (Integer.toString's digit set is 0-9a-p).
    */
  def word(r: Int): String =
    java.lang.Integer.toString(r, 26)
      .map(c => ('a' + "0123456789abcdefghijklmnop".indexOf(c)).toChar)

  /** Zipf(1) cumulative weights over ranks 0..V-1. */
  private val cum: Array[Double] = {
    val a = new Array[Double](V)
    var s = 0.0
    var r = 0
    while (r < V) { s += 1.0 / (r + 1); a(r) = s; r += 1 }
    a
  }

  /** (doc_id, label, text): Zipf body + doc-unique tail words + a
    * planted collocation ("qqqqq zzzzz", every 3rd doc) + 5 repeated NB
    * marker tokens keyed to the doc's parity label. Docs 0..Twins-1
    * get a twin at id 100000+i whose 6th token is replaced (shingle
    * J ≈ 77/83 — decisively above the 3/5 join threshold).
    */
  lazy val corpus: Seq[(Long, String, String)] = {
    var s = 20260815L
    def nextU(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble) / (1L << 53).toDouble
    }
    def zipfWord(): String = {
      val u = nextU() * cum(V - 1)
      var lo = 0; var hi = V - 1
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (cum(mid) < u) lo = mid + 1 else hi = mid
      }
      word(lo)
    }
    val base = (0 until Docs).map { i =>
      val body = Vector.fill(DocLen)(zipfWord())
      val uniq = (0 until UniquePerDoc).map(k => word(V + i * UniquePerDoc + k))
      val coll = if (i % 3 == 0) Seq("qqqqq", "zzzzz") else Nil
      val label = if (i % 2 == 0) "even" else "odd"
      val marker = Seq.fill(5)("mm" + label)
      (i.toLong, label, (body ++ uniq ++ coll ++ marker).mkString(" "))
    }
    val twins = base.take(Twins).map { case (i, label, text) =>
      val toks = text.split(" ").toVector
      (100000L + i, label, toks.updated(5, word(50000 + i.toInt)).mkString(" "))
    }
    base ++ twins
  }
}

class ZipfVocabSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs =
    ZipfFixture.corpus.toDF("doc_id", "label", "text").cache()

  test("fixture: 10^4+ distinct words, Zipf head present") {
    val distinct = ZipfFixture.corpus.flatMap(_._3.split(" ")).toSet
    assert(distinct.size >= 10000, s"only ${distinct.size} distinct words")
    // rank-0 word ("a") must dominate: a real Zipf head, not uniform
    val counts = ZipfFixture.corpus.flatMap(_._3.split(" "))
      .groupBy(identity).view.mapValues(_.size)
    assert(counts(ZipfFixture.word(0)) > counts.values.sum / 100)
  }

  test("prefix-filter join on a realistic vocabulary: exactly the " +
      "planted twins, candidate volume bounded (no all-pairs collapse)") {
    val obs = org.apache.spark.sql.Observation("zipf_prefix_cand")
    val got = Dedup.prefixFilterNearDups(docs, "doc_id", col("text"),
        candObs = Some(obs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0 until ZipfFixture.Twins)
      .map(i => (i.toLong, 100000L + i)).toSet
    assert(got == want)
    val cands = obs.get("candidate_pairs").asInstanceOf[Long]
    val allPairs = 930L * 929L / 2
    assert(cands < allPairs / 20,
      s"candidate volume $cands is within 20x of all-pairs $allPairs — " +
        "the rare-prefix guarantee collapsed on a realistic vocabulary")
  }

  test("recallAudit on the realistic vocabulary: the banded-minhash " +
      "pipeline surfaces every planted twin the exact join proves") {
    val audit = Dedup.recallAudit(docs, "doc_id", col("text"),
      lshThreshold = 0.6)
    try {
      val rows = audit.collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getBoolean(3))).toMap
      assert(rows.keySet ==
        (0 until ZipfFixture.Twins).map(i => (i.toLong, 100000L + i)).toSet)
      // J ≈ 77/83 per twin — far above the 0.6 LSH threshold, so the
      // capped banding must find all of them on THIS vocabulary too
      assert(rows.values.forall(identity),
        s"minhash missed ${rows.count(!_._2)} of ${rows.size} true pairs")
    } finally { audit.unpersist(); () }
  }

  test("Dice collocations: the planted always-adjacent bigram wins at " +
      "dice = 1.0 over 10^4+ unigram types") {
    val top = TextAnalysis.collocationsTopK(docs, col("text"), k = 3)
      .collect()
    assert(top.head.getString(0) == "qqqqq zzzzz")
    assert(top.head.getAs[Long]("dice_micro") == 1000000L)
  }

  test("NB classifier separates parity labels by 5 marker tokens " +
      "against ~80 Zipf noise tokens per doc") {
    val res = Classify.nbTrainApply(docs, docs, "doc_id", "label",
      col("text"))
    val n = res.count()
    val ok = res.filter(col("correct")).count()
    assert(n == ZipfFixture.Docs + ZipfFixture.Twins)
    assert(ok.toDouble / n >= 0.95, s"accuracy ${ok.toDouble / n}")
  }

  test("BPE trainer runs its merge rounds over a 10^4+-word table") {
    val words = Bpe.wordTable(docs, col("text"))
    val (merges, fin) = Bpe.train(words, 15)
    try {
      assert(merges.nonEmpty && merges.size <= 15)
      assert(merges.forall(_.count > 0))
      assert(fin.count() > 10000) // one row per distinct word survives
    } finally { fin.unpersist(); () }
  }

  test("WordPiece trainer runs its likelihood-gain rounds over the " +
      "same table") {
    val words = Bpe.wordTable(docs, col("text"))
    val (merges, fin) = WordPiece.train(words, 15)
    try {
      assert(merges.nonEmpty && merges.size <= 15)
      assert(fin.count() > 10000)
    } finally { fin.unpersist(); () }
  }

  test("unigram-LM trainer converges on the Zipf word table and its " +
      "Viterbi encode reassembles every common word exactly") {
    val words = UnigramLm.wordTable(docs, col("text"))
    val model = UnigramLm.train(words, rounds = 2, vocabSize = 400)
    assert(model.probs.nonEmpty)
    // encode the 50 most frequent words: pieces must concatenate back
    val common = words.orderBy(col("cnt").desc).limit(50)
    val enc = common.select(col("w"),
        UnigramLm.viterbiPath(col("w"), model.probs).as("path"))
      .collect()
    enc.foreach { r =>
      val w = r.getString(0)
      val path = r.getString(1)
      assert(path != null, s"unsegmentable common word $w")
      val joined = path.split("\\|").filter(_.nonEmpty).mkString
      assert(joined == w, s"pieces of $w reassemble to $joined")
    }
  }
}
