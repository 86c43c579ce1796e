package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed unigram-LM (SentencePiece-style) tokenizer training —
  * the subword-vocabulary alternative to [[Bpe]]: instead of greedily
  * merging pairs, keep a piece vocabulary with probabilities and let
  * each word pick its best SEGMENTATION under the model (Viterbi),
  * re-estimating piece probabilities from the chosen segmentations
  * (hard EM — the Viterbi variant of SentencePiece's E step, which is
  * what makes the training replayable round-for-round by a SQL oracle;
  * soft-EM forward/backward sums are not order-stable across engines).
  *
  * Like BPE, training runs on the WORD-FREQUENCY table, not the corpus:
  * the corpus collapses once, rounds cost O(unique words). Per round:
  * (1) Viterbi-segment every word MAP-ONLY — the model rides the plan as
  * a literal map, driver-sized by the `vocabSize` parameter (the
  * [[Similarity]] codebook contract); (2) one explode + hash aggregation
  * recounts pieces; (3) the new counts (vocab-sized) come back to the
  * driver for the next round's literal. Nothing word- or corpus-sized is
  * ever collected.
  *
  * Exact arithmetic, no libm: piece probabilities are integer micro-unit
  * quotients `(cnt * 1e6) div total`; a Viterbi path's score is the
  * PRODUCT of `p_micro / 1e6` factors accumulated left-to-right —
  * products and exactly-representable-divisor divisions are
  * correctly-rounded IEEE in every engine, so DP comparisons (and the
  * deterministic shortest-piece tie-break) agree bit-for-bit with the
  * DuckDB oracle. Segmentations use [[Bpe]]'s delimited-string
  * representation (`|a||bc|`).
  */
object UnigramLm {

  /** Micro-unit scale for piece probabilities. */
  val Unit = 1000000L

  /** Maximum piece length the DP considers (and the seed enumerates). */
  val MaxPiece = 4

  /** Trained model: `probs` = piece → micro-unit probability (the apply
    * literal), `counts` = the final round's piece counts, `total` their
    * sum — all vocab-sized driver data by the `vocabSize` contract.
    */
  final case class Model(probs: Map[String, Long],
      counts: Seq[(String, Long)], total: Long)

  /** (w, cnt): the word-frequency table — words restricted to
    * `[A-Za-z]+` (the [[Bpe.wordTable]] contract, minus the delimiter
    * wrapping: unigram DP works on the raw word).
    */
  def wordTable(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextAnalysis.tokens(text)).as("w"))
      .filter(col("w").rlike("^[A-Za-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Seed piece counts: every substring of length 1..`maxPiece` of every
    * word, weighted by word count; keep the top `vocabSize` by
    * (count desc, piece asc) PLUS every single character (so any train
    * word stays segmentable). Output: (piece, scnt).
    */
  def seedCounts(words: DataFrame, maxPiece: Int = MaxPiece,
      vocabSize: Int = 256): DataFrame = {
    val subs = words
      .select(col("w"), col("cnt"),
        explode(sequence(lit(0), length(col("w")) - 1)).as("i"))
      .select(col("w"), col("cnt"), col("i"),
        explode(sequence(lit(1), lit(maxPiece))).as("k"))
      .filter(col("i") + col("k") <= length(col("w")))
      .select(col("w").substr(col("i") + 1, col("k")).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("scnt"))
    val top = subs.orderBy(col("scnt").desc, col("piece")).limit(vocabSize)
    top.unionByName(subs.filter(length(col("piece")) === 1)).distinct()
  }

  /** Viterbi segmentation of `word` under a literal prob map: the
    * delimited best path (`|a||bc|`), maximizing the product of
    * `p_micro / 1e6` factors; score ties prefer the SHORTER last piece
    * (candidate order k = 1..maxPiece, first maximum wins). Map-only —
    * one `aggregate` DP over the word's positions, O(len · maxPiece)
    * lookups per word, no shuffle, no UDF.
    *
    * `unkMicro`: apply-time floor for single characters absent from the
    * vocabulary (None during training, where the seed guarantees
    * coverage); a word unsegmentable without a floor yields null.
    */
  def viterbiPath(word: Column, probs: Map[String, Long],
      maxPiece: Int = MaxPiece, unkMicro: Option[Long] = None): Column = {
    require(probs.nonEmpty, "empty piece vocabulary")
    val m = typedLit(probs)
    val init = array(struct(lit(1.0).as("s"), lit("").as("p")))
    val stepped = aggregate(
      sequence(lit(1), length(word)), init,
      (acc, i) => {
        val cands = (1 to maxPiece).map { k =>
          val piece = word.substr(i - lit(k - 1), lit(k))
          val p0 = try_element_at(m, piece)
          val p = if (k == 1 && unkMicro.isDefined)
            coalesce(p0, lit(unkMicro.get)) else p0
          when(lit(k) <= i && p.isNotNull, {
            val prev = element_at(acc, i - lit(k - 1))
            when(prev.isNotNull, struct(
              (prev("s") * (p.cast("double") / lit(1000000.0d))).as("s"),
              concat(prev("p"), lit("|"), piece, lit("|")).as("p")))
          })
        }
        // fold the candidates through a LAMBDA accumulator, not a plain
        // Column reduce: `cands.reduce((a, b) => when(..., a)...(b))`
        // splices the left operand's WHOLE SUBTREE into the result 3-4
        // times per level, so four candidates expand to ~60 copies of the
        // substr/map-lookup trees — a plan whose analysis, canonicalization
        // and per-AQE-stage stringification dominated the unigram gates'
        // wall (driver-sampled r21; same left-fold semantics, first
        // maximum wins, shorter-piece tie-break preserved: candidates are
        // in k-ascending order and only a STRICTLY greater score replaces
        // the running best — `best("s") >= c("s")` keeps best on ties).
        val best = aggregate(
          array(cands: _*),
          lit(null).cast("struct<s:double,p:string>"),
          (bst, c) =>
            when(c.isNull, bst).when(bst.isNull, c)
              .when(bst("s") >= c("s"), bst).otherwise(c))
        concat(acc, array(best))
      })
    element_at(stepped, length(word) + 1)("p")
  }

  /** One E-step: per-piece counts of the Viterbi segmentations of the
    * word table under `probs`, weighted by word count. One map-only
    * segmentation pass + one hash aggregation.
    */
  def pieceCounts(words: DataFrame, probs: Map[String, Long],
      maxPiece: Int = MaxPiece): DataFrame =
    words
      .select(col("cnt"), viterbiPath(col("w"), probs, maxPiece).as("path"))
      .filter(col("path").isNotNull)
      .select(col("cnt"),
        explode(split(expr("trim(BOTH '|' FROM path)"), "\\|\\|")).as("piece"))
      .groupBy("piece").agg(sum("cnt").as("pcnt"))

  private def toMicro(counts: Seq[(String, Long)]): (Map[String, Long], Long) = {
    val total = counts.map(_._2).sum
    require(total > 0, "no piece occurrences to normalize")
    require(total <= Long.MaxValue / Unit / 2,
      s"piece-count total $total too large for exact micro-units")
    (counts.map { case (piece, c) => piece -> (c * Unit) / total }.toMap, total)
  }

  /** Run `rounds` of hard EM over a [[wordTable]] relation. The word
    * table is persisted for the duration (each round re-reads it); the
    * per-round collects are vocab-sized by the `vocabSize` contract.
    */
  def train(words: DataFrame, rounds: Int, vocabSize: Int = 256,
      maxPiece: Int = MaxPiece): Model = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val w = words.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var counts: Seq[(String, Long)] =
        seedCounts(w, maxPiece, vocabSize).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toSeq
      var (probs, total) = toMicro(counts)
      for (_ <- 1 to rounds) {
        counts = pieceCounts(w, probs, maxPiece).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toSeq
        val pt = toMicro(counts)
        probs = pt._1; total = pt._2
      }
      Model(probs, counts.sortBy(_._1), total)
    } finally { w.unpersist(); () }
  }
}
