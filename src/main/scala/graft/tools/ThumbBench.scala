package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Production-dimension thumbnail scaling run (r13 — VERDICT r12 #7):
  * times [[Multimodal.thumbnails]] at ImageNet-ish 224×224 over
  * 512×512 gradient PNGs at two corpus sizes and reports the measured
  * exponent — the q_image_resize ScaleCheck row measures the 5×5 luma
  * path; this measures where the codec + interpolation CPU actually
  * lives. Expect ≈ 1.0 (embarrassingly parallel, no shuffle; per-doc
  * cost is fixed decode + tw·th interpolations) —
  * `tools/run_main.sh graft.tools.ThumbBench [nBase] [ratio]`. */
object ThumbBench {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(300)
    val ratio = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def run(n: Int): Double = {
      val pngUdf = udf((id: Long) => Multimodal.gradientPng(id, 512, 512))
      val media = spark.range(0, n)
        .select(col("id").as("doc_id"), pngUdf(col("id")).as("media"),
                lit("image/png").as("mime"))
        .as[Multimodal.MediaRow]
      val t0 = System.nanoTime()
      val c = Multimodal.thumbnails(media, 224, 224).count()
      val dt = (System.nanoTime() - t0) / 1e9
      assert(c == n)
      dt
    }
    run(nBase) // warm codegen + codec classes
    val tBase = run(nBase)
    val tBig = run(nBase * ratio)
    val e = math.log(tBig / tBase) / math.log(ratio.toDouble)
    println(f"THUMB_224 n_base=$nBase ratio=$ratio t_base=$tBase%.2f s " +
      f"t_big=$tBig%.2f s exponent=$e%.2f")
    spark.stop()
  }
}
