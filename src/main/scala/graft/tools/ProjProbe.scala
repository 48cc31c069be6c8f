package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolates q_embed_project's cost components: scan, cast, widen,
  * per-plane dot (codegen) vs aggregate(zip_with) (interpreted HOF),
  * sort, posexplode. `sbt "runMain graft.tools.ProjProbe [sfDir]"` */
object ProjProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    val emb = graft.Tables.load(spark, dir, "embeddings")

    def time(label: String)(f: => DataFrame): Unit = {
      f.count() // warm
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        f.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PROJPROBE $label%-32s ${best}%8.3f s")
    }

    val vd = col("embedding").cast("array<double>")
    val planes = graft.ops.Quant.Planes

    time("scan only") { emb.select("vec_id") }
    time("scan+cast") { emb.select(col("vec_id"), vd.as("vd")) }
    time("scan+cast+widen") {
      graft.Tables.widen(emb.select(col("vec_id"), vd.as("vd")))
    }
    val dotArr = array(planes.map(p =>
      round(graft.functions.VectorFunctions.dot(col("vd"), typedlit(p.toSeq)), 6)).toSeq: _*)
    time("cast+16xdot (narrow)") {
      emb.select(col("vec_id"), vd.as("vd")).select(col("vec_id"), dotArr.as("proj"))
    }
    time("cast+16xdot+widen") {
      graft.Tables.widen(emb.select(col("vec_id"), vd.as("vd")))
        .select(col("vec_id"), dotArr.as("proj"))
    }
    val hofArr = array(planes.map { plane =>
      val p = typedlit(plane.toSeq)
      round(aggregate(zip_with(col("embedding"), p, (x, w) => x * w),
        lit(0.0), (acc, v) => acc + v), 6)
    }.toSeq: _*)
    time("16xHOF (narrow, original)") {
      emb.select(col("vec_id"), hofArr.as("proj"))
    }
    time("16xHOF+widen") {
      graft.Tables.widen(emb.select(col("vec_id"), col("embedding")))
        .select(col("vec_id"), hofArr.as("proj"))
    }
    time("full query (registered)") {
      graft.Queries.all("q_embed_project")(spark, dir)
    }
    val guarded = when(size(col("vd")) === graft.ops.Quant.Dim, dotArr)
      .otherwise(raise_error(concat(
        lit("probe: expected 64-dim embedding, got "),
        size(col("vd")).cast("string"))))
    def base = emb.select(col("vec_id"), vd.as("vd"))
    time("dot+guard (narrow)") {
      base.select(col("vec_id"), guarded.as("proj"))
    }
    time("dot+guard+sort") {
      base.select(col("vec_id"), guarded.as("proj")).orderBy("vec_id")
    }
    time("dot+guard+sort+explode+sort") {
      base.select(col("vec_id"), guarded.as("proj"))
        .orderBy("vec_id")
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "value")))
        .orderBy("vec_id", "dim")
    }
    time("dot+NOguard+sort+explode+sort") {
      base.select(col("vec_id"), dotArr.as("proj"))
        .orderBy("vec_id")
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "value")))
        .orderBy("vec_id", "dim")
    }
    time("dot+guard+explode+ONEsort") {
      base.select(col("vec_id"), guarded.as("proj"))
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "value")))
        .orderBy("vec_id", "dim")
    }
    time("dot+guard+BARRIER+explode+2sort") {
      base.select(col("vec_id"), guarded.as("proj"))
        .repartition(spark.sparkContext.defaultParallelism)
        .orderBy("vec_id")
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "value")))
        .orderBy("vec_id", "dim")
    }
    time("dot+guard+explode+NOsort") {
      base.select(col("vec_id"), guarded.as("proj"))
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "value")))
    }
    // join formulation: no Generate, one dot per output row
    import spark.implicits._
    val planesDf = broadcast(
      planes.zipWithIndex.map { case (p, i) => (i, p.toSeq) }.toSeq
        .toDF("dim", "plane"))
    time("joinform+2sort") {
      base.join(planesDf)
        .select(col("vec_id"), col("dim"),
          when(size(col("vd")) === graft.ops.Quant.Dim,
            round(graft.functions.VectorFunctions.dot(col("vd"), col("plane")), 6))
          .otherwise(raise_error(lit("bad dim"))).as("value"))
        .orderBy("vec_id", "dim")
    }
    spark.stop()
  }
}
