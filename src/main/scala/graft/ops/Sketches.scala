package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic frequency/cardinality sketches with EXACT replay — the
  * sublinear-state summaries a 100 TB pipeline keeps when the full
  * distribution doesn't fit anywhere (per-token counts across a crawl,
  * distinct-token cardinality per shard). Unlike `approx_count_distinct`
  * (whose HLL registers are engine-private and not oracle-comparable),
  * both sketches here are pure functions of md5 — every register value
  * and every estimate is bit-identical across engines, partitionings,
  * and cluster sizes, so the GATES can hash-compare the sketch itself,
  * not just a tolerance boolean.
  *
  * Scale contract: the Count-Min register table is `depth × width` rows
  * (constant in corpus size — that is the point of the sketch) and rides
  * a broadcast join; the KMV state is `k` longs per group via the
  * bounded [[CorpusSelect.topPerGroup]] aggregator, so shuffle volume is
  * `k · groups · tasks` regardless of skew. Nothing corpus-sized is
  * collected or sorted on one task.
  */
object Sketches {

  /** Whitespace tokens of non-blank docs, empty tokens dropped — the
    * shared tokenization of the qt_* gates.
    */
  private def tokenRows(docs: DataFrame, text: Column,
      extra: Column*): DataFrame =
    docs.filter(length(trim(text)) > 0)
      .select(extra :+ explode(TextAnalysis.tokens(text)).as("tok"): _*)
      .filter(col("tok") =!= "")

  /** Count-Min sketch audit (Cormode & Muthukrishnan 2005): hash every
    * token into `depth` rows of `width` counters (register `(i, slot)`
    * accumulates the counts of every token with `md5("cms" i ":" tok)
    * mod width = slot`), estimate a token's frequency as the MIN of its
    * `depth` registers, and put the estimate NEXT TO the exact count for
    * the top-`k` tokens by estimate — the one-sided-error audit shape
    * (CMS never undercounts; `overcount = est − n ≥ 0` is the collision
    * noise the width buys down). This is the [[Dedup]] `jaccardEstimates`
    * pattern applied to frequencies: the at-scale pipeline thresholds on
    * the estimate, this measures what that costs.
    *
    * Plan: one token hash-aggregation (map-side partial), a `depth`-way
    * literal-array explode of the DISTINCT-token table (not the corpus),
    * a second constant-size aggregation into the register table, and a
    * broadcast join back — the register table is `depth·width` rows no
    * matter the corpus. Top-k lands via TakeOrderedAndProject
    * (`est` DESC, `tok` ASC — tokens unique, so the cut is total).
    *
    * All-long arithmetic; estimates are exact integers, so the gate
    * hash-compares them directly.
    */
  def cmsAudit(docs: DataFrame, text: Column, depth: Int = 4,
      width: Int = 512, k: Int = 50): DataFrame = {
    require(depth > 0 && width > 0 && k > 0,
      s"depth/width/k must be positive, got $depth/$width/$k")
    val cnt = tokenRows(docs, text).groupBy("tok")
      .agg(count(lit(1)).as("n"))
    // one row per (distinct token, sketch row): the slot this token's
    // count lands in on row i — md5Long is < 2^60, so % stays in range
    val slots = cnt
      .select(col("tok"), col("n"),
        explode(array((0 until depth).map(i => lit(i)): _*)).as("i"))
      .withColumn("slot",
        TextAnalysis.md5Long(
          concat(lit("cms"), col("i").cast("string"), lit(":"),
            col("tok"))) % width)
    val reg = slots.groupBy("i", "slot").agg(sum("n").as("reg"))
    slots.join(broadcast(reg), Seq("i", "slot"))
      .groupBy("tok").agg(min("reg").as("est"), min("n").as("n"))
      .select(col("tok"), col("n"), col("est"),
        (col("est") - col("n")).as("overcount"))
      .orderBy(col("est").desc, col("tok")).limit(k)
  }

  /** K-minimum-values distinct sketch (Bar-Yossef et al. 2002) per
    * group: hash the distinct tokens of each group, keep the `k`
    * smallest hashes, and estimate the group's distinct-token count as
    * `(k−1) · 2⁶⁰ / h₍ₖ₎` (md5Long is uniform on [0, 2⁶⁰)). The output
    * row carries the exact distinct count (the audit column), the k-th
    * hash (the sketch's entire state boundary — two KMV sketches merge
    * by union-and-truncate, which is what makes this THE mergeable
    * distinct sketch for shard-then-combine counting), the estimate,
    * and a 3·RSD acceptance boolean (RSD = 1/√(k−2)).
    *
    * A group with fewer than `k` distinct hashes hasn't filled the
    * sketch — its estimate is exactly the distinct count and `kth_hash`
    * reports −1.
    *
    * Exactness across engines: the k smallest longs per group come from
    * the bounded [[CorpusSelect.topPerGroup]] aggregator with score
    * `−h` (double) and tie-break id `h` ASC — double rounding of a
    * 60-bit long is monotone, so equal-rounded scores fall back to the
    * ASC id, which IS ascending-hash order: the cut is exact. The
    * estimate divides exactly-representable doubles (`k−1` and 2⁶⁰ have
    * ≤ 6 significant bits; the long→double cast and the divide are
    * IEEE-determined), so even the double column is bit-identical.
    */
  def kmvDistinct(docs: DataFrame, groupCol: String, text: Column,
      k: Int = 64): DataFrame = {
    require(k > 2, s"k must exceed 2 (RSD = 1/sqrt(k-2)), got $k")
    val two60 = 1152921504606846976.0 // 2^60, exact in double
    val dh = tokenRows(docs, text, col(groupCol))
      .select(col(groupCol), TextAnalysis.md5Long(col("tok")).as("h"))
      .distinct()
    val exact = dh.groupBy(groupCol)
      .agg(count(lit(1)).as("exact_distinct"))
    val kmin = CorpusSelect.topPerGroup(
      dh.withColumn("_neg", -col("h").cast("double")),
      groupCol, col("_neg"), "h", k)
    val sk = kmin.groupBy(groupCol)
      .agg(max("h").as("_kth"), count(lit(1)).as("_n_in"))
    exact.join(sk, groupCol)
      .withColumn("kth_hash",
        when(col("_n_in") < k, lit(-1L)).otherwise(col("_kth")))
      .withColumn("est",
        when(col("_n_in") < k, col("exact_distinct").cast("double"))
          .otherwise(lit((k - 1).toDouble * two60) /
            col("_kth").cast("double")))
      .withColumn("within_3rsd",
        abs(col("est") - col("exact_distinct")) <=
          lit(3.0 / math.sqrt((k - 2).toDouble)) *
            col("exact_distinct").cast("double"))
      .select(col(groupCol), col("exact_distinct"), col("kth_hash"),
        col("est"), col("within_3rsd"))
      .orderBy(groupCol)
  }
}
