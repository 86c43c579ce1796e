package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Quantifies the [[Dedup.BandBucketCap]] recall caveat: capping band
  * buckets preserves CANDIDATE-graph connectivity exactly (the OpsSpec
  * preservation test), but the downstream jaccard verify filters edges
  * individually, so a surviving star edge can fail verification where a
  * dropped in-cap edge would have passed — borderline-threshold components
  * can fragment. This spec measures that loss on randomized corpora whose
  * clusters straddle the threshold, with a cap far below the cluster size
  * so the effect has every chance to show.
  *
  * Two properties are asserted, one is measured:
  *   - capped same-component pairs are a SUBSET of uncapped (capping can
  *     only lose reachability, never invent it);
  *   - recall stays above the documented floor;
  *   - the measured recall is reported via `info()` and recorded in the
  *     [[Dedup.BandBucketCap]] scaladoc.
  */
class BandCapRecallSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  /** All (a, b) pairs that land in the same verified component. */
  private def componentPairs(df: org.apache.spark.sql.DataFrame,
      cap: Int): Set[(Long, Long)] = {
    val pairs = Dedup.minhashNearDups(df, "doc_id", col("text"),
      threshold = 0.4, bandCap = cap)
    try {
      val labels = Dedup.connectedComponents(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      labels.groupBy(_._2).values.flatMap { g =>
        val ids = g.map(_._1).sorted
        for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
      }.toSet
    } finally pairs.unpersist()
  }

  test("band-cap recall on borderline-threshold clusters: subset, floor, measured") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 500).map(i => s"tok$i")
    val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    var id = 0L
    // 20 clusters of 10 members; each member mutates 0..8 scattered tokens
    // of a 40-token base, spanning pairwise jaccard from ~1.0 down through
    // the 0.4 threshold — exactly the borderline regime the caveat is about
    (0 until 20).foreach { _ =>
      val base = Seq.fill(40)(vocab(rnd.nextInt(500)))
      (0 until 10).foreach { _ =>
        val w = base.toArray
        (0 until rnd.nextInt(9)).foreach(_ =>
          w(rnd.nextInt(w.length)) = vocab(rnd.nextInt(500)))
        docs += ((id, w.mkString(" "))); id += 1
      }
    }
    // unclustered noise
    (0 until 100).foreach { _ =>
      docs += ((id, Seq.fill(40)(vocab(rnd.nextInt(500))).mkString(" "))); id += 1
    }
    val df = docs.toSeq.toDF("doc_id", "text")

    // cap=4 on 10-member clusters: most members are over-cap in every band,
    // surviving only through star edges — the worst case for the caveat
    val capped = componentPairs(df, cap = 4)
    val uncapped = componentPairs(df, cap = 1000)

    assert(uncapped.nonEmpty, "generator must produce verified components")
    assert(capped.subsetOf(uncapped),
      s"capping invented reachability: ${(capped -- uncapped).take(5)}")
    val recall = capped.size.toDouble / uncapped.size
    info(f"verified-component recall at cap=4 vs uncapped: $recall%.4f " +
      s"(${capped.size}/${uncapped.size} same-component pairs)")
    assert(recall >= 0.85,
      f"recall $recall%.3f fell below the documented floor of 0.85")
  }

  test("capObs counter bounds and explains the capped candidate loss") {
    // near-identical 12-member clusters: every member shares every band
    // bucket, so cap=4 drops candidates in bulk and the counter must
    // both fire and UPPER-BOUND the globally missed pairs (a pair the
    // cap drops in one band can resurface via another band; the counter
    // counts per-bucket drops, so missed <= counted — the "explains any
    // missed pair" inequality)
    val docs = (0 until 5).flatMap { c =>
      val base = (0 until 40).map(i => s"w${c}_$i")
      (0 until 12).map { m =>
        ((c * 12 + m).toLong, (base :+ s"mut$m").mkString(" "))
      }
    }
    val df = docs.toDF("doc_id", "text")
    val sh = Dedup.shingleHashes(df, "doc_id", col("text")).cache()
    try {
      def cands(cap: Int, obs: Option[org.apache.spark.sql.Observation])
          : Set[(Long, Long)] =
        Dedup.candidatePairsFromShingles(sh, "doc_id", cap, obs)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val obsCapped = org.apache.spark.sql.Observation("cap4")
      val obsUncapped = org.apache.spark.sql.Observation("cap1000")
      val capped = cands(4, Some(obsCapped))
      val uncapped = cands(1000, Some(obsUncapped))

      assert(obsUncapped.get("capped_pairs") == 0L &&
        obsUncapped.get("overcap_members") == 0L,
        "an uncapped run must observe zero drops")
      val counted = obsCapped.get("capped_pairs").asInstanceOf[Long]
      val overcap = obsCapped.get("overcap_members").asInstanceOf[Long]
      assert(counted > 0L && overcap > 0L,
        "12-member near-identical clusters at cap=4 must hit the cap")
      val missed = uncapped -- capped
      assert(missed.nonEmpty, "cap=4 on 12-member clusters must drop pairs")
      assert(missed.size <= counted,
        s"counter must explain every missed candidate pair: " +
          s"missed=${missed.size} > counted=$counted")
      info(s"cap=4: missed ${missed.size} candidate pairs, counter " +
        s"counted $counted per-bucket drops across $overcap over-cap rows")
    } finally { sh.unpersist(); () }
  }
}
