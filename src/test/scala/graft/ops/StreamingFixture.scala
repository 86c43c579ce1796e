package graft.ops

/** Shared scaffolding for file-stream operator specs: batch files with
  * pinned mtimes (so `maxFilesPerTrigger=1` drains them in a
  * deterministic order), temp dirs, and a bounded drain — one
  * implementation instead of a copy per spec.
  */
trait StreamingFixture extends org.scalatest.Assertions {
  def spark: org.apache.spark.sql.SparkSession

  def writeBatchFile(dir: String, name: String,
      df: org.apache.spark.sql.DataFrame, mtime: Long): Unit = {
    val p = s"$dir/$name"
    df.coalesce(1).write.mode("overwrite").parquet(p)
    java.nio.file.Files.walk(java.nio.file.Paths.get(p)).forEach { f =>
      java.nio.file.Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    try assert(q.awaitTermination(120000), "stream did not drain")
    finally q.stop()
}
