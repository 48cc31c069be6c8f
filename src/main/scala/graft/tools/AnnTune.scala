package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Similarity

/** (tables × probe-flips) sweep for the IVF/LSH index: recall@3 vs the
  * exact kNN and the candidate volume (the query-cost proxy) for each
  * config — the r9 tuning loop behind the recall-floor raise.
  * `sbt "runMain graft.tools.AnnTune [sfDir]"` */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val knn = Similarity.qKnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count()
    println(f"${"T"}%3s ${"q"}%3s ${"cands"}%12s ${"cands/query"}%12s ${"recall@3"}%9s")
    for (t <- Seq(4, 6, 8, 10); q <- Seq(2, 3, 4, 5, 6)) {
      val ann = Similarity.annNeighbors(emb, 3, t, q)
      val aset = ann.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val recall = (knn & aset).size.toDouble / knn.size
      val nc = Similarity.annCandidatesFrom(
        Similarity.annIndex(Similarity.normalizeEmbeddings(emb), n, t, q),
        n, t).count()
      println(f"$t%3d $q%3d $nc%12d ${nc.toDouble / n}%12.1f $recall%9.4f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
