package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed WordPiece merge training — the third member of the
  * tokenizer-trainer family next to [[Bpe]] (count-argmax merges) and
  * [[UnigramLm]] (hard-EM segmentation): WordPiece (Schuster & Nakajima
  * 2012; the BERT tokenizer) keeps BPE's merge mechanics but selects each
  * round's merge by LIKELIHOOD GAIN — `score(a,b) = count(ab) /
  * (count(a) * count(b))` — so a rare-but-cohesive pair beats a frequent
  * incidental one (the classic `un+##able` vs `th+e` example).
  *
  * Mechanics are [[Bpe]]'s wholesale: training runs on the word-frequency
  * table (corpus collapses once; rounds cost O(unique words)), and
  * segmentations are delimited strings (`|a||b|`) so a merge is one
  * `replace` with identical semantics in Spark and DuckDB — round-for-
  * round SQL-replayable. Per round this trainer adds one SYMBOL-count
  * aggregation next to the pair-count aggregation (both vocab-/pair-
  * bounded after their hash agg, joined broadcast-small), because the
  * score needs the denominator counts under the CURRENT segmentation.
  *
  * Exact arithmetic, no libm: the score is the pico-unit integral
  * quotient `(count(ab) * 1e12) div (count(a) * count(b))`, computed in
  * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so the numerator product
  * never overflows 64 bits, then BIGINT on selection — the
  * [[UnigramLm]]/bigramLmScore micro-unit portability pattern one scale
  * finer (scores live in [0, 1e12]: count(ab) <= min counts <= product).
  * Ties break (score desc, pair count desc, a, b) — deterministic across
  * engines under the alphanumeric symbol contract. No `##` continuation
  * marking: pieces here are plain substrings (the delimiter contract),
  * which keeps apply = [[Bpe.segment]] with the trained table.
  */
object WordPiece {

  /** Pico-unit scale for merge scores (1e12: micro-units would collapse
    * distinct small scores of high-count denominators into one bucket
    * and overweight the tie-break).
    */
  val Pico = 1000000000000L

  final case class Merge(round: Int, a: String, b: String,
      pairCount: Long, scorePico: Long)

  /** Run `merges` WordPiece rounds over a [[Bpe.wordTable]] relation.
    * Returns the merge table (driver-sized: one row per round) and the
    * final segmented word relation, persisted — the caller owns it and
    * must `unpersist()` (the [[Bpe.train]] contract).
    */
  def train(words: DataFrame, merges: Int): (Seq[Merge], DataFrame) = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var w = words.persist(lvl)
    var ok = false
    try {
      w.count()
      val out = Seq.newBuilder[Merge]
      var exhausted = false
      for (r <- 1 to merges if !exhausted) {
        topPair(w) match {
          case None => exhausted = true
          case Some((a, b, c, sp)) =>
            require(!(a + b).contains("|"),
              s"WordPiece symbols must not contain '|': merge ($a, $b)")
            out += Merge(r, a, b, c, sp)
            val merged = w
              .select(regexp_replace(col("seg"),
                lit(java.util.regex.Pattern.quote(s"|$a||$b|")),
                lit(java.util.regex.Matcher.quoteReplacement(s"|$a$b|"))).as("seg"),
                col("cnt"))
              .persist(lvl)
            try merged.count()
            catch { case e: Throwable => merged.unpersist(); throw e }
            w.unpersist()
            w = merged
        }
      }
      ok = true
      (out.result(), w)
    } finally if (!ok) w.unpersist()
  }

  /** Highest-score adjacent pair under the current segmentation:
    * (a, b, pair count, score_pico), None when no word has two symbols
    * left. One explode+agg for pairs, one for symbols; the score join is
    * between two aggregated vocab-bounded relations (broadcast-small),
    * never the word table.
    */
  private def topPair(w: DataFrame): Option[(String, String, Long, Long)] = {
    val sy = split(expr("trim(BOTH '|' FROM seg)"), "\\|\\|")
    val sym = w.select(col("cnt"), explode(sy).as("s"))
      .groupBy("s").agg(sum("cnt").as("c"))
    val pairs = w.select(col("cnt"), sy.as("sy"))
      .select(col("cnt"), explode(when(size(col("sy")) > 1,
        transform(sequence(lit(1), size(col("sy")) - 1),
          i => struct(element_at(col("sy"), i).as("a"),
            element_at(col("sy"), i + 1).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("c"))
    pairs
      .join(broadcast(sym.withColumnRenamed("s", "a")
        .withColumnRenamed("c", "ca")), "a")
      .join(broadcast(sym.withColumnRenamed("s", "b")
        .withColumnRenamed("c", "cb")), "b")
      .select(col("a"), col("b"), col("c"),
        expr(s"CAST((CAST(c AS DECIMAL(38,0)) * $Pico) DIV " +
          "(CAST(ca AS DECIMAL(38,0)) * cb) AS BIGINT)").as("sp"))
      .orderBy(col("sp").desc, col("c").desc, col("a"), col("b"))
      .limit(1)
      .collect()
      .headOption
      .map((r: Row) => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
  }
}
