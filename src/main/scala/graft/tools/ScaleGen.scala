package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generates a larger scale factor from an existing test dir by
  * replication with key remapping — the 10× proof-run input
  * (`sbt "runMain graft.tools.ScaleGen [src] [dst] [reps]"`).
  *
  * Each replica is made DISJOINT, not identical: ids get a per-replica
  * offset, document tokens a per-replica salt prefix, and embeddings a
  * per-replica circular rotation. That preserves each replica's
  * internal structure (planted duplicates, value distributions, join
  * fan-outs) while preventing cross-replica pairs, so the output and
  * candidate volumes of the dedup/similarity operators scale linearly
  * with the data — the property a scaling measurement needs. Dim
  * tables (region/nation/part/supplier) are copied verbatim: dims grow
  * slower than facts in every real schema, and the FK ranges stay
  * valid. `events.ts` is copied in whatever physical layout the source
  * dir carries (nanos-as-long for the original fixture, TIMESTAMP_MICROS
  * for the regenerated one) — [[graft.Tables.events]] adapts to both. */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "/root/repo/tmpdata/sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional 4th arg: output part-files per table (0 = preserve the
    // source layout). The driver fixtures are single-file/single-row-
    // group, and narrow replication preserves that — so every scan of
    // an unrepartitioned clone runs in ONE task regardless of
    // maxPartitionBytes (a 1-row-group parquet cannot split). A real
    // 100x corpus arrives as many KEY-SORTED shards; parts > 0 range-
    // partitions on each table's natural key before writing — splits
    // for scan parallelism while PRESERVING key clustering (a plain
    // round-robin repartition measured 12x faster doc scans but 7x
    // slower TPC-H joins: it shreds RLE encoding and key locality).
    val parts = if (args.length > 3) args(3).toInt else 0
    val sortKey = Map(
      "customer" -> "c_custkey", "orders" -> "o_orderkey",
      "lineitem" -> "l_orderkey", "events" -> "event_id",
      "documents" -> "doc_id", "embeddings" -> "vec_id")
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      (sortKey.get(t).filter(_ => parts > 0) match {
        case Some(k) => df.repartitionByRange(parts, col(k))
        case None    => df
      }).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    def replicate(df: DataFrame): DataFrame =
      df.withColumn("rep", explode(sequence(lit(0L), lit(reps - 1L))))

    // dims verbatim
    Seq("region", "nation", "part", "supplier").foreach(t => write(read(t), t))

    val KO = 10000000L // orderkey span per replica
    val KC = 10000000L // custkey span
    val KD = 10000000L // doc/vec id span
    val KE = 100000000L // event id span

    write(replicate(read("customer"))
      .withColumn("c_custkey", col("c_custkey") + col("rep") * KC)
      .drop("rep"), "customer")

    write(replicate(read("orders"))
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * KO)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * KC)
      .drop("rep"), "orders")

    write(replicate(read("lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * KO)
      .drop("rep"), "lineitem")

    write(replicate(read("events"))
      .withColumn("event_id", col("event_id") + col("rep") * KE)
      .withColumn("user_id", col("user_id") + col("rep") * KC)
      .drop("rep"), "events")

    // documents: per-replica token salt keeps each replica's internal
    // dup structure but disjoins vocabularies across replicas; the
    // trailing-space convention of the fixture text is preserved.
    // Replica 0 keeps its tokens VERBATIM (r9): fixed query literals
    // (BM25 terms, the search phrase) must exist at every scale, and
    // an unsalted replica stays vocabulary-disjoint from the salted
    // ones, so no cross-replica pair can appear
    write(replicate(read("documents"))
      .withColumn("text",
        when(col("rep") === 0, col("text")).otherwise(
          concat(array_join(
            transform(split(trim(col("text")), " "),
                      t => concat(lit("r"), col("rep"), lit("x"), t)), " "),
            lit(" "))))
      .withColumn("doc_id", col("doc_id") + col("rep") * KD)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("rep"), "documents")

    // embeddings: circular rotation decorrelates replicas while
    // preserving every norm and the within-replica geometry
    write(replicate(read("embeddings"))
      .withColumn("embedding",
        transform(sequence(lit(1), size(col("embedding"))),
          j => element_at(col("embedding"),
            (((j - 1 + col("rep") * 7) % size(col("embedding"))) + 1)
              .cast("int"))))
      .withColumn("vec_id", col("vec_id") + col("rep") * KD)
      .drop("rep"), "embeddings")

    println(s"SCALEGEN wrote ${reps}x of $src to $dst")
    spark.stop()
  }
}
