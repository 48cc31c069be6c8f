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
  /** Content-keyed MATERIALIZED parquet table: the build runs once per
    * corpus fingerprint, lands in a fresh temp dir, and consumers read
    * it back as a plain parquet scan — the shared shape behind the ANN
    * posting / page-edge / domain-edge / cooc-pair tables (r13 review:
    * the builder was copy-pasted four times). Returns the cache of
    * PATHS; pair with a `spark.read.parquet(cache.get(...))` accessor. */
  private[graft] def materializedParquet(table: String, prefix: String)
      (build: (SparkSession, String) => org.apache.spark.sql.DataFrame)
      : IndexCache[String] =
    new IndexCache[String](table, { (s, d) =>
      val p = java.nio.file.Files
        .createTempDirectory(prefix).toString + "/data.parquet"
      build(s, d).write.mode("overwrite").parquet(p)
      p
    })

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

/** Semantics-keyed LRU of PERSISTED derived DataFrames for facade
  * entry points whose input is an arbitrary DataFrame (no backing dir
  * to fingerprint — [[IndexCache]] can't key it). The r11 verdict
  * flagged the predecessor pattern (persist() inside the operator, no
  * unpersist, caller-trusted clearCache): a long-lived session
  * composing many distinct inputs leaked one cache entry per input.
  *
  * Contract:
  *  - keyed by Spark's analyzed-plan semantics (`sameSemantics`), so
  *    the same logical input — even rebuilt via an identical chain —
  *    reuses one entry; a REPEATED get never adds an entry;
  *  - bounded at `maxEntries` live persists: eviction UNPERSISTS the
  *    least-recently-used entry (its returned handles stay correct —
  *    they just recompute);
  *  - an entry whose blocks were dropped externally (a caller's
  *    clearCache between queries — the Bench/Verify discipline) is
  *    re-persisted on the next get instead of silently running
  *    uncached forever. */
private[graft] final class PlanCache(maxEntries: Int = 4) {
  private case class Entry(input: org.apache.spark.sql.DataFrame,
                           out: org.apache.spark.sql.DataFrame)
  private var entries = List.empty[Entry]

  def get(input: org.apache.spark.sql.DataFrame)
         (build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = synchronized {
    entries.find(_.input.sameSemantics(input)) match {
      case Some(e) =>
        entries = e :: entries.filterNot(_ eq e)
        if (e.out.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
          e.out.persist()
        e.out
      case None =>
        val out = build(input).persist()
        entries = Entry(input, out) :: entries
        entries.drop(maxEntries).foreach(_.out.unpersist(blocking = false))
        entries = entries.take(maxEntries)
        out
    }
  }

  /** For lifecycle tests. */
  private[graft] def liveEntryCount: Int = synchronized {
    entries.count(_.out.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE)
  }
}
