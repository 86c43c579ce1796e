package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential test: the 2-pass distributed budget prefix must equal the
  * textbook global-window form on every partitioning, including budget
  * boundaries landing mid-partition, exactly on a row, and past the corpus.
  */
class CorpusSelectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def oracle(rows: Seq[(Long, Long)], budget: Long): Seq[(Long, Long)] = {
    // global-window reference implementation
    val df = rows.toDF("id", "w")
    val cum = sum(col("w")).over(
      Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("cum", cum).filter(col("cum") <= budget)
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect().toSeq
  }

  private def run(rows: Seq[(Long, Long)], budget: Long, parts: Int): Seq[(Long, Long)] =
    CorpusSelect.budgetPrefix(rows.toDF("id", "w"), "w", budget,
        Seq(col("id").asc), cumCol = "cum", numPartitions = parts)
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect().toSeq

  // deterministic pseudo-random weights (no Random: repeatability)
  private val corpus: Seq[(Long, Long)] =
    (1L to 200L).map(i => (i, (i * 2654435761L % 97) % 13))

  test("matches the global-window oracle across budgets and partitionings") {
    val total = corpus.map(_._2).sum
    val budgets = Seq(0L, 1L, total / 7, total / 2, total - 1, total, total + 100)
    for (b <- budgets; p <- Seq(1, 3, 8)) {
      assert(run(corpus, b, p) == oracle(corpus, b), s"budget=$b parts=$p")
    }
  }

  test("budget landing exactly on a row boundary keeps that row") {
    val rows = Seq((1L, 5L), (2L, 5L), (3L, 5L))
    assert(run(rows, 10L, 2) == Seq((1L, 5L), (2L, 10L)))
  }

  test("zero-weight rows at the boundary are kept (cum <= budget)") {
    val rows = Seq((1L, 5L), (2L, 0L), (3L, 5L), (4L, 0L), (5L, 1L))
    // cum: 5,5,10,10,11 — budget 10 keeps ids 1-4
    assert(run(rows, 10L, 3).map(_._1) == Seq(1L, 2L, 3L, 4L))
  }

  test("shardAssign matches the window oracle and is partition-invariant") {
    val budget = 20L
    val expected = {
      // reference: global running sum, shard = preceding-cum / budget
      var cum = 0L
      corpus.sortBy(_._1).map { case (id, w) =>
        val before = cum; cum += w
        (id, w, cum, before / budget)
      }
    }
    for (p <- Seq(1, 3, 8)) {
      val got = CorpusSelect.shardAssign(corpus.toDF("id", "w"), "w", budget,
          Seq(col("id").asc), cumCol = "cum", numPartitions = p)
        .orderBy("id").select("id", "w", "cum", "shard")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == expected, s"parts=$p")
    }
  }

  test("shardAssign: every row assigned, shards contiguous, fill bounded " +
      "by budget + one straddler") {
    val budget = 17L
    val r = CorpusSelect.shardAssign(corpus.toDF("id", "w"), "w", budget,
        Seq(col("id").asc), numPartitions = 5)
      .select("id", "w", "shard").as[(Long, Long, Long)].collect().toSeq
    assert(r.map(_._1).sorted == corpus.map(_._1).sorted) // nothing filtered
    val shards = r.map(_._3).distinct.sorted
    assert(shards == (0L until shards.length)) // contiguous from 0
    val maxW = corpus.map(_._2).max
    r.groupBy(_._3).foreach { case (sid, rows) =>
      val fill = rows.map(_._2).sum
      assert(fill <= budget + maxW, s"shard $sid overfilled: $fill")
    }
    intercept[IllegalArgumentException] {
      CorpusSelect.shardAssign(corpus.toDF("id", "w"), "w", 0L, Seq(col("id")))
    }
  }

  test("shardAssign: an over-budget document leaves a documented id gap, " +
      "never splits") {
    val rows = Seq((1L, 3L), (2L, 50L), (3L, 4L)) // doc 2 outweighs budget 10
    val r = CorpusSelect.shardAssign(rows.toDF("id", "w"), "w", 10L,
        Seq(col("id").asc), numPartitions = 2)
      .orderBy("id").select("id", "shard").as[(Long, Long)].collect().toSeq
    // doc2 starts at cum-before 3 → shard 0; doc3 at cum-before 53 → shard 5
    assert(r == Seq((1L, 0L), (2L, 0L), (3L, 5L)))
  }

  test("rejects non-long weight column") {
    val df = Seq((1L, 1.5)).toDF("id", "w")
    assertThrows[IllegalArgumentException] {
      CorpusSelect.budgetPrefix(df, "w", 10L, Seq(col("id")))
    }
  }

  test("fractionPrefix(num, den) == budgetPrefix(ceil(total*num/den))") {
    val total = corpus.map(_._2).sum
    for ((num, den) <- Seq((1L, 10L), (1L, 3L), (2L, 3L), (1L, 1L)); p <- Seq(1, 4)) {
      val budget = (total * num + den - 1) / den
      val frac = CorpusSelect.fractionPrefix(corpus.toDF("id", "w"), "w",
          num, den, Seq(col("id").asc), cumCol = "cum", numPartitions = p)
        .orderBy("id").select("id", "cum").as[(Long, Long)].collect().toSeq
      assert(frac == oracle(corpus, budget), s"fraction $num/$den parts=$p")
    }
  }

  test("fractionPrefix rejects fractions outside (0, 1]") {
    val df = corpus.toDF("id", "w")
    assertThrows[IllegalArgumentException] {
      CorpusSelect.fractionPrefix(df, "w", 0L, 10L, Seq(col("id")))
    }
    assertThrows[IllegalArgumentException] {
      CorpusSelect.fractionPrefix(df, "w", 11L, 10L, Seq(col("id")))
    }
  }

  test("fraction mode resolves k from pass-1 subtotals: no extra job vs " +
      "a fixed budget (the count() scan it replaces is gone)") {
    val sc = spark.sparkContext
    def jobsDuring(group: String)(body: => Unit): Int = {
      sc.setJobGroup(group, group)
      try body finally sc.clearJobGroup()
      // the status store is fed asynchronously — poll until the count is
      // stable across two reads
      var last = -1
      var cur = sc.statusTracker.getJobIdsForGroup(group).length
      while (cur != last) {
        Thread.sleep(200)
        last = cur
        cur = sc.statusTracker.getJobIdsForGroup(group).length
      }
      cur
    }
    val df = corpus.toDF("id", "w")
    val fixed = jobsDuring("csel-fixed") {
      CorpusSelect.budgetPrefix(df, "w", 100L, Seq(col("id").asc),
        numPartitions = 4).unpersist()
    }
    val frac = jobsDuring("csel-frac") {
      CorpusSelect.fractionPrefix(df, "w", 1L, 10L, Seq(col("id").asc),
        numPartitions = 4).unpersist()
    }
    assert(frac == fixed,
      s"fraction mode ran $frac jobs vs $fixed for a fixed budget — " +
        "budget resolution must not add a scan")
  }

  // deterministic multi-group corpus with duplicate scores inside groups
  private def groupedCorpus: Seq[(String, Long, Double)] =
    (1L to 300L).map { i =>
      val g = s"g${i % 7}"
      val score = ((i * 2654435761L % 97) % 11).toDouble / 10.0
      (g, i, score)
    }

  private def windowOracle(n: Int): Seq[(String, Long, Double)] = {
    val df = groupedCorpus.toDF("grp", "id", "s")
    val rn = row_number().over(
      Window.partitionBy("grp").orderBy(col("s").desc, col("id").asc))
    df.withColumn("rn", rn).filter(col("rn") <= n)
      .orderBy("grp", "id").select("grp", "id", "s")
      .as[(String, Long, Double)].collect().toSeq
  }

  test("topPerGroup matches the row_number window oracle, including " +
      "score ties broken by id") {
    val df = groupedCorpus.toDF("grp", "id", "s")
    for (n <- Seq(1, 3, 10)) {
      val got = CorpusSelect.topPerGroup(df, "grp", col("s"), "id", n, "s")
        .orderBy("grp", "id").as[(String, Long, Double)].collect().toSeq
      assert(got == windowOracle(n), s"n=$n")
    }
  }

  test("topPerGroup: n larger than every group returns all rows; " +
      "repartitioning never changes the result") {
    val base = groupedCorpus.toDF("grp", "id", "s")
    val all = CorpusSelect.topPerGroup(base, "grp", col("s"), "id", 1000, "s")
    assert(all.count() == 300)
    for (parts <- Seq(1, 13)) {
      val got = CorpusSelect.topPerGroup(
          base.repartition(parts), "grp", col("s"), "id", 3, "s")
        .orderBy("grp", "id").as[(String, Long, Double)].collect().toSeq
      assert(got == windowOracle(3), s"parts=$parts")
    }
  }

  test("groupedBudgetPrefix matches the per-group window oracle on every " +
      "partitioning, including group boundaries mid-partition") {
    // deterministic weights; 5 groups of very different sizes so group
    // boundaries land inside partitions and groups span partitions
    val rows = (1L to 400L).map { i =>
      val g = s"g${(i * i) % 5}"
      (g, i, (i * 2654435761L % 97) % 9)
    }
    val df = rows.toDF("grp", "id", "w")
    def oracle(budget: Long): Seq[(String, Long, Long)] = {
      val cum = sum(col("w")).over(Window.partitionBy("grp").orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
      df.withColumn("cum", cum).filter(col("cum") <= budget)
        .orderBy("grp", "id").select("grp", "id", "cum")
        .as[(String, Long, Long)].collect().toSeq
    }
    for (budget <- Seq(0L, 7L, 50L, 10000L); parts <- Seq(1, 3, 8)) {
      val r = CorpusSelect.groupedBudgetPrefix(df, "grp", "w", budget,
        Seq(col("id").asc), cumCol = "cum", numPartitions = parts)
      try {
        val got = r.orderBy("grp", "id").select("grp", "id", "cum")
          .as[(String, Long, Long)].collect().toSeq
        assert(got == oracle(budget), s"budget=$budget parts=$parts")
      } finally { r.unpersist(); () }
    }
  }

  test("groupedBudgetPrefix: zero-weight rows at a group's boundary are " +
      "kept; rejects non-string group and non-long weight") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, 0L), ("a", 3L, 1L),
      ("b", 4L, 5L), ("b", 5L, 5L)).toDF("grp", "id", "w")
    val r = CorpusSelect.groupedBudgetPrefix(df, "grp", "w", 5L,
      Seq(col("id").asc), cumCol = "cum", numPartitions = 2)
    try {
      // a: 5,5,6 -> ids 1,2 (zero-weight at the boundary stays)
      // b: 5,10 -> id 4
      assert(r.orderBy("id").select("id").as[Long].collect().toSeq ==
        Seq(1L, 2L, 4L))
    } finally { r.unpersist(); () }
    assertThrows[IllegalArgumentException] {
      CorpusSelect.groupedBudgetPrefix(
        Seq((1, 1L, 1L)).toDF("grp", "id", "w"), "grp", "w", 5L,
        Seq(col("id")))
    }
    assertThrows[IllegalArgumentException] {
      CorpusSelect.groupedBudgetPrefix(
        Seq(("a", 1L, 1.5)).toDF("grp", "id", "w"), "grp", "w", 5L,
        Seq(col("id")))
    }
  }

  test("groupedBudgetPrefix: a NULL group value is a real group — carry-in " +
      "applies across partitions, no per-partition budget reset") {
    // the null group is big enough to span partitions when range-
    // partitioned; a sentinel-based group tracker would reset its
    // running sum at every partition start
    val rows: Seq[(String, Long, Long)] =
      (1L to 60L).map(i => (null.asInstanceOf[String], i, 2L)) ++
        (61L to 70L).map(i => ("a", i, 2L))
    val df = rows.toDF("grp", "id", "w")
    val r = CorpusSelect.groupedBudgetPrefix(df, "grp", "w", 20L,
      Seq(col("id").asc), cumCol = "cum", numPartitions = 6)
    try {
      val byGroup = r.select("grp", "id").as[(Option[String], Long)]
        .collect().toSeq.groupBy(_._1)
      // budget 20 / weight 2 -> exactly 10 ids per group, the FIRST 10
      assert(byGroup(None).map(_._2).sorted == (1L to 10L),
        s"null group overspent or reset: ${byGroup(None).map(_._2).sorted}")
      assert(byGroup(Some("a")).map(_._2).sorted == (61L to 70L))
    } finally { r.unpersist(); () }
  }

  test("corpusDiff: null signatures are values, not absence — (null,null) " +
      "is unchanged, (null,x) is changed; string ids rejected by topPerGroup") {
    val oldV = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "same")).toDF("id", "text")
    val newV = Seq((1L, null.asInstanceOf[String]), (2L, "now present"),
      (3L, "same")).toDF("id", "text")
    val got = CorpusSelect.corpusDiff(oldV, newV, "id", md5(col("text")))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "unchanged"), (2L, "changed"), (3L, "unchanged")),
      s"null-signature rows misclassified: $got")
    assertThrows[IllegalArgumentException] {
      CorpusSelect.topPerGroup(
        Seq(("g", "uuid-1", 1.0)).toDF("grp", "id", "s"),
        "grp", col("s"), "id", 1)
    }
  }

  test("weightedSamplePerGroup matches the priority-window oracle and is " +
      "partition-invariant") {
    // deterministic "hash" and integer weights; two groups
    val rows = (1L to 120L).map { i =>
      (if (i % 2 == 0) "a" else "b", i, (i * 2654435761L) % 10007L, 1L + i % 7)
    }
    val df = rows.toDF("grp", "id", "u", "w")
    val oracle = {
      val pri = col("u").cast("double") / col("w").cast("double")
      val rn = row_number().over(
        Window.partitionBy("grp").orderBy(pri.asc, col("id").asc))
      df.withColumn("priority", pri).withColumn("rn", rn)
        .filter(col("rn") <= 4).orderBy("grp", "id")
        .select("grp", "id", "priority").as[(String, Long, Double)]
        .collect().toSeq
    }
    for (parts <- Seq(1, 7)) {
      val got = CorpusSelect.weightedSamplePerGroup(
          df.repartition(parts), "grp", "id", col("w"), col("u"), 4)
        .orderBy("grp", "id").as[(String, Long, Double)].collect().toSeq
      assert(got == oracle, s"parts=$parts")
    }
  }

  test("weightedSamplePerGroup: inclusion frequency tracks weight") {
    // 400 trials (groups); in each, one heavy row (w=9) vs nine light
    // (w=1) rows compete for a single slot. P(heavy wins) ≈ 9/(9+9·1)=0.5
    // vs 1/18 per light row — the heavy row must win FAR more often than
    // any light one, and the sample must be deterministic.
    val rows = for (g <- 1L to 400L; r <- 0L to 9L) yield {
      val id = g * 100 + r
      val u = (id * 1103515245L + 12345L) % 131071L // deterministic LCG residue
      (g, id, u, if (r == 0) 9L else 1L)
    }
    val df = rows.toDF("grp", "id", "u", "w")
    val won = CorpusSelect.weightedSamplePerGroup(df, "grp", "id",
        col("w"), col("u"), 1)
      .select("id").as[Long].collect().toSeq
    val heavyWins = won.count(_ % 100 == 0)
    assert(heavyWins > 120 && heavyWins < 280,
      s"heavy row should win ≈50% of 400 groups, got $heavyWins")
    // ... and a light row individually wins ≈1/18 of the time
    val perLight = (won.length - heavyWins) / 9.0
    assert(perLight < heavyWins / 2.0,
      s"each light row must win far less often: $perLight vs $heavyWins")
  }

  test("incrementalScores equals direct scoring of the new snapshot and " +
      "runs the scorer only over the delta") {
    val oldDf = Seq((1L, "aa"), (2L, "bb"), (3L, "cc"), (4L, "dd"))
      .toDF("id", "t")
    // 1 unchanged, 2 changed, 3 removed, 5 added
    val newDf = Seq((1L, "aa"), (2L, "BB"), (4L, "dd"), (5L, "ee"))
      .toDF("id", "t")
    var scorerInput: org.apache.spark.sql.DataFrame = null
    val scorer = (df: org.apache.spark.sql.DataFrame) => {
      scorerInput = df
      df.select(col("id"), length(col("t")).cast("long").as("score"))
    }
    val out = CorpusSelect.incrementalScores(
        scorer(oldDf), oldDf, newDf, "id", md5(col("t")), scorer)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val direct = newDf
      .select(col("id"), length(col("t")).cast("long").as("score"))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == direct)
    // the expensive scorer saw exactly the added+changed docs
    assert(scorerInput.select("id").as[Long].collect().toSet == Set(2L, 5L))
    // scorer output without the id column is rejected loudly
    val e = intercept[IllegalArgumentException] {
      CorpusSelect.incrementalScores(scorer(oldDf), oldDf, newDf, "id",
        md5(col("t")), df => df.select(length(col("t")).as("score")))
    }
    assert(e.getMessage.contains("id column"))
  }

  test("targetMatchScores: literal-map and broadcast-join forms are " +
      "identical; target-like docs outscore off-target; short docs score 0") {
    // N >> B: Laplace smoothing adds B pseudo-counts per corpus, so a
    // fixture whose real gram mass is smaller than B measures smoothing
    // noise, not distribution match — 2000 docs puts Nt ~ 12x B
    val target = Seq.tabulate(2000)(i => (100L + i, "the quick brown fox"))
    val raw = target ++ Seq(
      (1L, "the quick brown fox"),  // pure target profile
      (2L, "zzz qqq vvv kkk"),      // pure off-target profile
      (3L, "single"),               // one token → no bigrams
      (4L, "the quick brown zzz"))  // 2 target grams + 1 novel
    val rawDf = raw.toDF("doc_id", "text")
    val tgtDf = target.toDF("doc_id", "text")
    // 512 buckets: the fixture's 7 grams are collision-free there ("vvv
    // kkk" and "quick brown" share a bucket at 256, which couples the
    // off-target score to a target gram and muddies the ordering assert)
    def run(maxLiteral: Int) =
      CorpusSelect.targetMatchScores(rawDf, tgtDf, "text", "doc_id",
          buckets = 512, maxLiteral = maxLiteral)
        .orderBy("doc_id").select("doc_id", "n_grams", "dsir_micro")
        .as[(Long, Long, Long)].collect().toSeq
    val lit0 = run(maxLiteral = 1000) // literal-map scoring
    val bj0 = run(maxLiteral = 1)     // forced broadcast-join scoring
    assert(lit0 == bj0)
    val m = lit0.map(r => r._1 -> r).toMap
    assert(m(1L)._2 == 3 && m(2L)._2 == 3 && m(3L)._2 == 0 && m(4L)._2 == 3)
    assert(m(3L)._3 == 0L)
    // the DSIR ordering: target-profile > mixed > off-target
    assert(m(1L)._3 > m(4L)._3, s"target vs mixed: $lit0")
    assert(m(4L)._3 > m(2L)._3, s"mixed vs off-target: $lit0")
    assert(m(2L)._3 < 0L, "off-target grams must score negative")
  }

  test("targetMatchScores one-pass predicate form equals the two-corpus " +
      "form when target = raw.filter(pred)") {
    val d = (1L to 300L).map(i =>
      (i, s"tok${i % 11} tok${i % 7} tok${i % 5} tok${i % 3}",
        if (i % 4 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val two = CorpusSelect.targetMatchScores(
        d, d.filter(col("lang") === "en"), "text", "doc_id", buckets = 128)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val one = CorpusSelect.targetMatchScores(
        d, col("lang") === "en", "text", "doc_id", buckets = 128,
        maxLiteral = TextAnalysis.MaxLiteralVocab)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(one == two)
    assert(one.exists(_._3 != 0L)) // non-degenerate fixture
  }

  test("targetMatchScores: a null-text row scores (n_grams=0, " +
      "dsir_micro=0) on BOTH the literal-map and broadcast-join paths") {
    // the literal path would null-propagate through size/aggregate while
    // the join path's explode_outer+coalesce yields zeros — the fixed
    // contract is (0, 0) from both (CorpusSelect.dsirScore null coalesce)
    val raw = Seq(
      (1L, "the quick brown fox"),
      (2L, null: String),
      (3L, "the quick brown fox")).toDF("doc_id", "text")
    val tgt = Seq((10L, "the quick brown fox")).toDF("doc_id", "text")
    def run(maxLiteral: Int) =
      CorpusSelect.targetMatchScores(raw, tgt, "text", "doc_id",
          buckets = 64, maxLiteral = maxLiteral)
        .orderBy("doc_id").select("doc_id", "n_grams", "dsir_micro")
        .as[(Long, Long, Long)].collect().toSeq
    val lit0 = run(maxLiteral = 1000) // literal-map scoring
    val bj0 = run(maxLiteral = 1)     // forced broadcast-join scoring
    assert(lit0 == bj0)
    val m = lit0.map(r => r._1 -> r).toMap
    assert(m(2L) == ((2L, 0L, 0L)), s"null text must score (0,0): $lit0")
    assert(m(1L)._2 == 3 && m(3L)._2 == 3)
  }

  test("targetMatchScores literal form stays map-only: no exchange in " +
      "the per-doc scoring plan") {
    val d = (1L to 50L).map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3}"))
      .toDF("doc_id", "text")
    val scored = CorpusSelect.targetMatchScores(
      d, d.filter(col("doc_id") % 2 === 0), "text", "doc_id", buckets = 32)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-doc scoring must not shuffle:\n$plan")
  }

  test("topPerGroup aggregates with partial (map-side) combine, not a " +
      "window sort: the plan has two aggregate stages and no Window") {
    val df = groupedCorpus.toDF("grp", "id", "s")
    val plan = CorpusSelect.topPerGroup(df, "grp", col("s"), "id", 3, "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sort leaked into the plan:\n$plan")
    val aggs = "ObjectHashAggregate|SortAggregate|HashAggregate".r
      .findAllIn(plan).length
    assert(aggs >= 2, s"expected partial+final aggregation stages:\n$plan")
  }
}
