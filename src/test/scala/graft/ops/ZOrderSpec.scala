package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference Morton interleave (independent of the Column expression). */
  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference interleave, masks high bits") {
    val d = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L), (63L, 63L),
      (64L, 1L), (1023L, 512L)).toDF("x", "y")
    val got = d.select(col("x"), col("y"),
      ZOrder.zValue(col("x"), col("y"), bits = 6).as("z")).collect()
    got.foreach { r =>
      assert(r.getLong(2) == zRef(r.getLong(0) & 63L, r.getLong(1) & 63L, 6),
        s"x=${r.getLong(0)} y=${r.getLong(1)}")
    }
    // interleave basics: z(1,0)=1, z(0,1)=2, full 6-bit box -> 4095
    val m = got.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((1L, 0L)) == 1L && m((0L, 1L)) == 2L && m((63L, 63L)) == 4095L)
    // 64 wraps to 0 under the 6-bit mask
    assert(m((64L, 1L)) == m((0L, 1L)))
  }

  test("z-ordered layout prunes a second-dimension box to a file subset") {
    val grid = spark.range(64L * 64L)
      .select((col("id") / 64).cast("long").as("x"),
        (col("id") % 64).cast("long").as("y"))
    val root = java.nio.file.Files.createTempDirectory("zorder").toString
    // single-dimension layout: range-partitioned + sorted by x only
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$root/by_x")
    ZOrder.writeZOrdered(grid, "x", "y", s"$root/by_z", numFiles = 16, bits = 6)

    def filesWithMatches(path: String): Long =
      spark.read.parquet(path)
        .filter(col("y") >= 8 && col("y") <= 15)  // second dimension only
        .select(input_file_name()).distinct().count()

    // x-sorted files each contain every y value -> ALL 16 files match;
    // z-clustering keeps the y-box in a compact z-range -> a strict subset
    val xFiles = filesWithMatches(s"$root/by_x")
    val zFiles = filesWithMatches(s"$root/by_z")
    assert(xFiles == 16L, s"x-layout expected to spread y across all files, got $xFiles")
    assert(zFiles <= 8L, s"z-layout expected to confine the y-box, got $zFiles files")
    // same rows either way
    assert(spark.read.parquet(s"$root/by_z").count() == 64L * 64L)
  }
}
