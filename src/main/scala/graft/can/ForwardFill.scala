package graft.can

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forward-fill (reference T5, `--forward-fill`): values persist across rows
  * until superseded. Real implementation only in the legacy driver
  * (`/root/reference/src/main.cpp.bak:399-405`; current main prints
  * "FORWARD FILL NOT WRITTEN", `/root/reference/src/main.cpp:146-148`);
  * README.md:38 documents the intent — we implement it.
  *
  * Two implementations:
  *
  *   - [[windowed]] — the textbook `last(_, ignoreNulls) OVER (ORDER BY ts
  *     ROWS UNBOUNDED PRECEDING)`. A global ordered window forces ALL data
  *     through one partition: correct, concise, and a scale bottleneck.
  *     Kept for small outputs and as the differential-test oracle.
  *
  *   - [[distributed]] — the 100 TB design. Two passes over a range-
  *     partitioned sort:
  *       1. per-partition: last non-null value of each column (tiny summary,
  *          numPartitions × numCols, collected to the driver);
  *       2. prefix-combine the summaries (carry-in state per partition, an
  *          O(P × C) driver-side scan) and fill each partition locally with
  *          its broadcast carry-in.
  *     No global shuffle beyond the range exchange; each row is touched
  *     twice; parallelism = numPartitions throughout.
  */
object ForwardFill {

  /** Window fill. Keyless: single-partition global window (small outputs /
    * differential oracle). With `keyCols`: partitioned window — one shuffle
    * on the keys, fully parallel, the right tool when fill semantics are
    * per-entity (per signal source, per user) rather than global.
    */
  def windowed(df: DataFrame, orderCol: String, cols: Seq[String] = Nil,
      keyCols: Seq[String] = Nil): DataFrame = {
    val fillCols =
      if (cols.nonEmpty) cols
      else df.columns.toSeq.filter(c => c != orderCol && !keyCols.contains(c))
    val base = if (keyCols.isEmpty) Window.orderBy(orderCol)
      else Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol)
    val w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val projected = df.columns.map { c =>
      if (fillCols.contains(c)) last(col(c), ignoreNulls = true).over(w).as(c)
      else col(c)
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** Scalable two-pass fill. Result is range-sorted by `orderCol`.
    *
    * CONTRACT (the [[Bucketer.exactDistributed]] pattern): the returned
    * DataFrame is persisted (MEMORY_AND_DISK) and already materialized —
    * the caller owns the blocks and must `unpersist()` when done (or
    * clearCache in a harness). The corpus-sized sorted intermediate is
    * released before returning; lineage stays intact, so a lost result
    * block recomputes through the (uncached) sort.
    */
  def distributed(df: DataFrame, orderCol: String, cols: Seq[String] = Nil,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    // toIntOption: "spark.sql.shuffle.partitions" may legitimately be
    // non-numeric ("auto" under some AQE distributions) — fall back to
    // cluster parallelism instead of throwing (the prefixCore rule)
    val parts = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toIntOption
        .getOrElse(spark.sparkContext.defaultParallelism)
    val fillCols = if (cols.nonEmpty) cols else df.columns.toSeq.filter(_ != orderCol)
    val schema = df.schema
    val fillIdx = fillCols.map(schema.fieldIndex).toArray
    val n = fillIdx.length

    // persist (NOT localCheckpoint): the summary pass and the fill pass see
    // identical partition boundaries because the range partitioner samples
    // once at RDD construction and recomputed blocks reuse the same
    // partitioner instance; localCheckpoint would truncate lineage and make
    // any executor loss an unrecoverable failure at cluster scale. The
    // cache is released in `finally` below after the result materializes —
    // CacheManager pins persisted plans, so leaving it to the
    // ContextCleaner (the pre-r19 comment's claim, refuted at Bucketer
    // r18) leaked one full input copy per call in long-running sessions.
    val sorted = df.repartitionByRange(parts, col(orderCol)).sortWithinPartitions(orderCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {

    // Pass 1: per-partition last non-null per fill column.
    val summaries: Array[(Int, Array[Any])] = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val lasts = new Array[Any](n)
      it.foreach { r =>
        var j = 0
        while (j < n) { val v = r.get(fillIdx(j)); if (v != null) lasts(j) = v; j += 1 }
      }
      Iterator.single((pid, lasts))
    }.collect()

    // Prefix-combine: carry-in for partition p = merged lasts of 0..p-1.
    val byPid = summaries.sortBy(_._1)
    val carryIn = new Array[Array[Any]](byPid.length)
    val acc = new Array[Any](n)
    byPid.foreach { case (pid, lasts) =>
      carryIn(pid) = acc.clone()
      var j = 0
      while (j < n) { if (lasts(j) != null) acc(j) = lasts(j); j += 1 }
    }
    val bc = spark.sparkContext.broadcast(carryIn)

    // Pass 2: local fill with broadcast carry-in.
    val filled = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val state = bc.value(pid).clone()
      it.map { r =>
        val vals = new Array[Any](r.length)
        var i = 0
        while (i < r.length) { vals(i) = r.get(i); i += 1 }
        var j = 0
        while (j < n) {
          val v = vals(fillIdx(j))
          if (v != null) state(j) = v else vals(fillIdx(j)) = state(j)
          j += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
    val result = spark.createDataFrame(filled, schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try result.count() // materialize while `sorted` is still cached
    catch { case e: Throwable => result.unpersist(); throw e }
    result
    } finally { sorted.unpersist(); () }
  }
}
