package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Per-round profile for q_dedup_cluster: how much of its wall time is
  * the feeding jaccard pair query vs the label-propagation rounds?
  * `sbt "runMain graft.tools.ClusterProfile [sfDir]"` */
object ClusterProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"CLUSTER_STAGE $label%-18s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val pairs = Dedup.qSimJaccard(spark, dir)
    time("jaccard_pairs") { println(s"  pairs=${pairs.count()}") }
    val edges = time("edges_checkpoint") {
      pairs.select(explode(array(
          struct(col("doc_a").as("src"), col("doc_b").as("dst")),
          struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        // mirrors dedupClusters: AQE would freeze a 1-partition layout
        // into every round
        .repartition(spark.sparkContext.defaultParallelism, col("src"))
        .localCheckpoint()
    }
    println(s"  edges=${edges.count()} parts=${edges.rdd.getNumPartitions}")
    // mirrors Dedup.dedupClusters: min-seed + propagation + pointer jump
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .localCheckpoint(false)
    var prevSum = labels.agg(sum(col("label"))).head().getLong(0)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      time(f"round_$rounds%02d") {
        val nbrMin = edges.join(labels, edges("dst") === labels("id"))
          .groupBy(col("src")).agg(min(col("label")).as("nbr_min"))
        val prop = labels
          .join(nbrMin, labels("id") === nbrMin("src"), "left")
          .select(col("id"),
                  least(col("label"), coalesce(col("nbr_min"), col("label")))
                    .as("label"))
        labels = prop.as("x")
          .join(prop.select(col("id").as("jid"), col("label").as("jlabel")).as("j"),
                col("x.label") === col("j.jid"), "left")
          .select(col("x.id").as("id"),
                  coalesce(col("j.jlabel"), col("x.label")).as("label"))
          .localCheckpoint(false)
        val s = labels.agg(sum(col("label"))).head().getLong(0)
        converged = s == prevSum
        prevSum = s
      }
      rounds += 1
    }
    println(s"ROUNDS $rounds")
    time("full_query") { Dedup.qDedupCluster(spark, dir).count() }
    spark.stop()
  }
}
