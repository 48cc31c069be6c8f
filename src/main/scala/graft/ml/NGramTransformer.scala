package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{BooleanParam, IntParam, Param, ParamMap, ParamValidators}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, lower, split, trim}
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

import graft.ops.Text

/** The reference plugin as a first-class Spark ML pipeline stage — the
  * idiomatic packaging of a configurable transform in this ecosystem
  * (the analog of the reference's CDAP plugin registration,
  * `NGramTransform.java:66-79`): a `Transformer` with `Param`s for the
  * input column, output column, n, and the strict fail-fast mode, a
  * `transformSchema` that reproduces the reference's DEPLOY-TIME
  * schema gate (`NGramTransform.java:83-93` — reject a missing or
  * non-array/non-string input before any data moves), and
  * `DefaultParamsWritable` persistence so the configured stage
  * round-trips through `save`/`load` like any Pipeline stage.
  *
  * Semantics are exactly [[graft.ops.Text.ngramCol]] /
  * [[graft.ops.Text.ngramColStrict]] (R6 + R9: 1:1 row map, short rows
  * yield empty arrays, strict mode fails the run), and — mirroring the
  * reference's output contract (R3/R7, `NGramTransformTest.java:163-165`)
  * — the DEFAULT output schema is exactly one field, the n-gram array;
  * set `append = true` to keep input columns (the usual Spark-ML
  * convention) instead.
  *
  * A string input column is tokenized first (`Tokenizer` semantics:
  * lowercase, trim, split on whitespace); an array<string> column maps
  * straight through the n-gram expression.
  */
class NGramTransformer(override val uid: String)
    extends Transformer with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graft_ngram"))

  final val inputCol: Param[String] =
    new Param[String](this, "inputCol", "input column: string or array<string>")
  final val outputCol: Param[String] =
    new Param[String](this, "outputCol", "output n-gram array column")
  final val n: IntParam =
    new IntParam(this, "n", "n-gram width (>= 1)", ParamValidators.gtEq(1))
  final val strict: BooleanParam = new BooleanParam(this, "strict",
    "fail the run when a row has fewer than n tokens (reference R9 fail-fast)")
  final val append: BooleanParam = new BooleanParam(this, "append",
    "keep input columns (Spark-ML convention) instead of the reference's " +
      "single-field output contract")

  setDefault(outputCol -> "ngrams", n -> 2, strict -> false, append -> false)

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setN(v: Int): this.type = set(n, v)
  def setStrict(v: Boolean): this.type = set(strict, v)
  def setAppend(v: Boolean): this.type = set(append, v)

  /** The deploy-time schema gate (reference `NGramTransform.java:83-93`):
    * input must exist and be string or array<string>. */
  override def transformSchema(schema: StructType): StructType = {
    require(isDefined(inputCol), "inputCol must be set")
    val in = $(inputCol)
    val field = schema.fields.find(_.name == in).getOrElse(
      throw new IllegalArgumentException(s"input field $in not in schema"))
    field.dataType match {
      case StringType | ArrayType(StringType, _) => ()
      case other => throw new IllegalArgumentException(
        s"input field $in must be string or array<string>, got $other")
    }
    val out = StructField($(outputCol), ArrayType(StringType), nullable = false)
    if ($(append)) StructType(schema.fields :+ out) else StructType(Seq(out))
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    val schema = ds.schema
    transformSchema(schema)
    val in = $(inputCol)
    val toks = schema(in).dataType match {
      case StringType => split(lower(trim(col(in))), "\\s+")
      case _ => col(in)
    }
    val grams =
      if ($(strict)) Text.ngramColStrict(toks, $(n)) else Text.ngramCol(toks, $(n))
    val df = ds.toDF()
    if ($(append)) df.withColumn($(outputCol), grams)
    else df.select(grams.as($(outputCol)))
  }

  override def copy(extra: ParamMap): NGramTransformer = defaultCopy(extra)
}

object NGramTransformer extends DefaultParamsReadable[NGramTransformer] {
  override def load(path: String): NGramTransformer = super.load(path)
}
