package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Content-keyed memo for per-corpus-dir derived artifacts (ANN
  * posting tables, near-dup band indexes, corpus sizes).
  *
  * The r6 review flagged the plain dir-keyed memos: correct for the
  * immutable test dirs, but a library caller mutating a corpus under
  * the same path silently got a stale index. The contract is now
  * explicit: each `get` re-fingerprints the backing table (a recursive
  * (path, length, mtime) listing — file metadata only, no data scan,
  * the parquet-footer-metadata analog) and rebuilds iff it changed.
  * Entries are REPLACED on change, so the map stays at one entry per
  * dir no matter how long a tuning loop runs; a superseded on-disk
  * artifact is left for JVM-exit temp cleanup (bounded by the number
  * of corpus mutations, not calls).
  */
private[graft] final class IndexCache[V](table: String,
                                         build: (SparkSession, String) => V) {
  private val entries = new ConcurrentHashMap[String, (String, V)]

  def get(spark: SparkSession, dir: String): V = {
    val k = IndexCache.fingerprint(spark, s"$dir/$table.parquet")
    entries.compute(dir, (_, old) =>
      if (old != null && old._1 == k) old else (k, build(spark, dir)))._2
  }

  /** For lifecycle tests: must stay flat across repeated `get`s. */
  private[graft] def entryCount: Int = entries.size
}

private[graft] object IndexCache {
  /** Cheap content fingerprint of a file or directory tree. */
  private[graft] def fingerprint(spark: SparkSession, path: String): String = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(st: FileStatus): Seq[String] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).sortBy(_.getPath.toString).toSeq.flatMap(walk)
      else Seq(s"${st.getPath}|${st.getLen}|${st.getModificationTime}")
    walk(fs.getFileStatus(p)).mkString("\n")
  }
}
