package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality/domain classification — the fastText/logreg role
  * in C4/CCNet-style curation (train a cheap classifier on labeled
  * docs, score the whole corpus, keep by predicted label), as a
  * multinomial Naive Bayes with Laplace smoothing.
  *
  * All arithmetic is exact-integer micro-units: a real NB sums LOG
  * probabilities, but `log` is libm-dependent (Java vs C can differ in
  * the last ulp), so the score here is the integer-scaled probability
  * `((cnt + 1) * unit) div (n_c + V)` summed exactly per token — the
  * [[TextAnalysis.bigramLmScore]] portability pattern: the same
  * "which class explains these tokens best" signal, deterministic
  * argmax, and bit-identical in any engine. (The linear-space surrogate
  * weights frequent tokens more than log-space NB would; it is a
  * DEFINED, documented scoring rule, not an approximation of one.)
  *
  * Scale shape: training is two hash aggregations over the exploded
  * train token stream ((label, token) counts, per-label totals) plus a
  * distinct-count for the vocabulary — all map-side combinable. The
  * model relation is (vocab × labels)-sized and joins the test stream
  * by (label, token) — a plain equi-join that AQE broadcasts when the
  * model is small and shuffles when it is not; nothing model-sized is
  * ever collected to the driver. Scoring collapses each test doc to its
  * DISTINCT tokens first (term frequency carried as a factor), so the
  * per-label cross multiplies distinct-token rows, not raw token rows.
  */
object Classify {

  /** Micro-unit scale for probabilities (1e6 = 6 decimal digits). */
  val Unit = 1000000L

  /** Trained NB model: `probs` = (label, w, p_micro) for every token
    * SEEN in that label's training docs; `labels` = (label,
    * prior_micro, floor_micro) where floor is the Laplace probability
    * of an unseen token under that label.
    */
  final case class NbModel(probs: DataFrame, labels: DataFrame)

  /** Train on `train` rows labeled by `labelCol`: Laplace-smoothed
    * per-(label, token) micro-unit probabilities. Blank-text docs are
    * excluded (they carry no tokens and would skew the doc priors).
    *
    * Two driver scalars are computed (vocabulary size, total doc
    * count) — both single longs, not data-sized collects.
    */
  def nbTrain(train: DataFrame, labelCol: String, text: Column,
      unit: Long = Unit): NbModel = {
    val base = train.filter(length(trim(text)) > 0)
      .select(col(labelCol).as("label"), TextAnalysis.tokens(text).as("_toks"))
    val tok = base.select(col("label"), explode(col("_toks")).as("w"))
    val cw = tok.groupBy("label", "w").agg(count(lit(1)).as("cnt"))
    val nc = cw.groupBy("label").agg(sum("cnt").as("n_tok"))
    val vocab = cw.select("w").distinct().count()
    val docs = base.groupBy("label").agg(count(lit(1)).as("n_docs"))
    val totalDocs = base.count()
    require(totalDocs > 0, "nbTrain needs at least one non-blank doc")
    val labels = docs.join(nc, "label")
      .select(col("label"),
        expr(s"(n_docs * ${unit}L) div ${totalDocs}L").as("prior_micro"),
        expr(s"${unit}L div (n_tok + ${vocab}L)").as("floor_micro"))
    val probs = cw.join(nc, "label")
      .select(col("label"), col("w"),
        expr(s"((cnt + 1) * ${unit}L) div (n_tok + ${vocab}L)").as("p_micro"))
    NbModel(probs, labels)
  }

  /** Score and classify `test` docs: per (doc, label), score_micro =
    * prior_micro + Σ over doc tokens (with repetition, via the distinct-
    * token tf factor) of p_micro-or-floor; prediction = argmax score,
    * ties broken by label ascending (min-struct aggregation — no window).
    * Docs whose text is null drop out (no tokens to score).
    *
    * Output: (idCol, pred_label, score_micro).
    */
  def nbClassify(test: DataFrame, idCol: String, text: Column,
      model: NbModel): DataFrame = {
    val tf = test.select(col(idCol), explode(TextAnalysis.tokens(text)).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("tf"))
    val scoredTok = tf
      .crossJoin(broadcast(model.labels.select("label", "floor_micro")))
      .join(model.probs, Seq("label", "w"), "left")
      .select(col(idCol), col("label"),
        (col("tf") * coalesce(col("p_micro"), col("floor_micro"))).as("p"))
    val docScores = scoredTok.groupBy(col(idCol), col("label"))
      .agg(sum("p").as("tok_micro"))
      .join(broadcast(model.labels.select("label", "prior_micro")), "label")
      .select(col(idCol), col("label"),
        (col("prior_micro") + col("tok_micro")).as("score_micro"))
    docScores.groupBy(col(idCol))
      .agg(min(struct((-col("score_micro")).as("_neg"),
        col("label").as("_lbl"))).as("_best"))
      .select(col(idCol), col("_best._lbl").as("pred_label"),
        (-col("_best._neg")).as("score_micro"))
  }

  /** Train-then-apply convenience: classify `test` with a model trained
    * on `train`, carrying the actual label for an accuracy readout.
    * Output: (idCol, pred_label, score_micro, actual, correct).
    */
  def nbTrainApply(train: DataFrame, test: DataFrame, idCol: String,
      labelCol: String, text: Column): DataFrame = {
    val model = nbTrain(train, labelCol, text)
    nbClassify(test, idCol, text, model)
      .join(test.select(col(idCol), col(labelCol).as("actual")), idCol)
      .withColumn("correct", col("pred_label") === col("actual"))
  }
}
