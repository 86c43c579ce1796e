package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * Sorting a 100 TB corpus by ONE column gives parquet min/max pruning on
  * that column only; a query filtering on a second dimension still reads
  * every file. Interleaving the bits of two bounded dimensions into one
  * sort key gives locality in BOTH: a box predicate (x in [a,b] AND y in
  * [c,d]) touches only the files whose z-range intersects the box —
  * the standard multi-dimensional clustering trick (Morton curves; used
  * by every lakehouse OPTIMIZE ZORDER implementation) expressed here as a
  * pure codegen column expression plus a range-partitioned writer.
  *
  * The z-value is deterministic bit arithmetic, so it is DuckDB-oracle-able
  * verbatim (gate `qt_zorder`); the layout benefit itself is asserted in
  * `ZOrderSpec` by counting the parquet files a box query's matching rows
  * land in under a z-ordered vs a single-column layout.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `x` (even positions) and `y` (odd
    * positions) into a single z-value: result bit 2i is x's bit i, bit
    * 2i+1 is y's bit i. Inputs are masked to `bits` bits first — callers
    * bucket unbounded dimensions (e.g. `x % 1024`) before interleaving.
    * Pure shift/and/or expression tree: whole-stage codegen, no UDF.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The matching DuckDB/ANSI SQL expression text for [[zValue]] — kept
    * here so the oracle is generated from the SAME bit positions as the
    * Spark expression (a transposed bit would silently pass both engines
    * if each hand-wrote its own formula).
    */
  def zValueSql(xExpr: String, yExpr: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mask = (1L << bits) - 1
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((((($xExpr) & $mask) >> $i) & 1) << ${2 * i})",
        s"((((($yExpr) & $mask) >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " | ", ")")
  }

  /** Write `df` z-clustered on (`xCol`, `yCol`): range-partition by the
    * z-value into `numFiles` output files, sort within each file, drop the
    * helper column. Range partitioning samples the z distribution, so
    * skewed dimensions still yield balanced files; each file then covers a
    * compact z-range and parquet footer min/max stats prune box queries
    * on BOTH dimensions. Pay the one clustering shuffle at write time;
    * every subsequent multi-dimensional scan skips.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, path: String,
      numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
