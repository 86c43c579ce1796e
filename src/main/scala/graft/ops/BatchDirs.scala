package graft.ops

import org.apache.spark.sql.SparkSession

/** The one implementation of the `prefix=N` batch-directory idiom every
  * streaming ledger in the library uses (claim stores, parquet sinks,
  * shard state, winners ledgers) — previously four near-identical private
  * copies that had to be fixed in lockstep.
  */
private[graft] object BatchDirs {

  /** Hadoop paths of `<root>/<prefix>N` directories (any N, including
    * negative compaction bases). Empty when the root does not exist.
    */
  def paths(spark: SparkSession, root: String, prefix: String)
      : Seq[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toIndexedSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(_.getPath)
  }

  /** The numeric ids of [[paths]]. */
  def ids(spark: SparkSession, root: String, prefix: String): Seq[Long] =
    paths(spark, root, prefix).map(_.getName.stripPrefix(prefix).toLong)

  /** Delete the listed batch directories whose id satisfies `cond` —
    * the stale-generation sweep a ledger writer runs after committing
    * its own partition (recursive; missing dirs are a no-op).
    */
  def deleteWhere(spark: SparkSession, root: String, prefix: String)(
      cond: Long => Boolean): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    paths(spark, root, prefix)
      .filter(d => cond(d.getName.stripPrefix(prefix).toLong))
      .foreach(d => fs.delete(d, true))
  }
}
