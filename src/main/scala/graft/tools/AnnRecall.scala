package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Similarity

/** Measures q_ann_ivf recall@3 and wall-time against the exact q_knn at
  * a given scale — the tuning loop for the LSH code length / probe
  * radius. `sbt "runMain graft.tools.AnnRecall [sfDir]"` */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // cold pass (JVM/codegen/page-cache cost visible), then warm pass
    val (_, cKnn) = time { Similarity.qKnn(spark, dir).count() }
    spark.catalog.clearCache()
    val (_, cAnn) = time { Similarity.qAnnIvf(spark, dir).count() }
    spark.catalog.clearCache()
    println(f"ANN_COLD t_knn=$cKnn%.2fs t_ann=$cAnn%.2fs")
    // stage profile: candidate generation (join+dot) vs + top-k agg
    val (nc, tCand) = time { Similarity.annCandidates(spark, dir).count() }
    val (_, tAgg) = time { Similarity.qAnnIvf(spark, dir).count() }
    spark.catalog.clearCache()
    println(f"ANN_STAGES n_cands=$nc cand_only=$tCand%.2fs with_agg=$tAgg%.2fs")
    val (knn, tKnn) = time {
      Similarity.qKnn(spark, dir).collect().map(r => (r.getLong(0), r.getLong(2)))
    }
    spark.catalog.clearCache()
    val (ann, tAnn) = time {
      Similarity.qAnnIvf(spark, dir).collect().map(r => (r.getLong(0), r.getLong(2)))
    }
    spark.catalog.clearCache()
    val kset = knn.toSet
    val aset = ann.toSet
    val recall = (kset & aset).size.toDouble / kset.size
    println(f"ANN_RECALL dir=$dir n_knn=${kset.size} n_ann=${aset.size} " +
      f"recall@3=$recall%.4f t_knn=$tKnn%.2fs t_ann=$tAnn%.2fs")
    // the quantized tiers against the same exact set (r14: + PQ)
    val (q8, tQ8) = time {
      graft.ops.Quant.qAnnQuant(spark, dir).select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    spark.catalog.clearCache()
    val (pq, tPq) = time {
      graft.ops.Quant.qAnnPq(spark, dir).select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    spark.catalog.clearCache()
    val rQ8 = (q8.toSet & kset).size.toDouble / kset.size
    val rPq = (pq.toSet & kset).size.toDouble / kset.size
    println(f"ANN_TIERS recall_int8=$rQ8%.4f recall_pq=$rPq%.4f " +
      f"t_int8=$tQ8%.2fs t_pq=$tPq%.2fs")
    spark.stop()
  }
}
