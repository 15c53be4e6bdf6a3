package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * Spark's higher-order array functions (no UDFs — the lambdas stay inside
  * Catalyst as expressions).
  *
  * Every fold is a strict left-to-right accumulation in double precision, so
  * results are bitwise deterministic and bitwise-reproducible by any engine
  * that folds the list in order (the DuckDB oracle does).
  */
object VectorOps {
  import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
  import graft.plans.{DotProductF, NormSqF}

  /** Elementwise product then ordered sum: dot(a, b). Native codegen'd
    * expression over array<float> (see graft.plans.VectorExpressions). */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductF(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Sum of squares (ordered fold), codegen'd. */
  def norm2(a: Column): Column =
    ExpressionUtils.column(NormSqF(ExpressionUtils.expression(a)))

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity: dot / (|a| * |b|); null (not a crash — Spark 4's
    * ANSI mode throws on x/0) when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom =!= 0.0, dot(a, b) / denom)
  }

  /** Higher-order-function formulations (kept as the reference semantics the
    * native expressions must reproduce bit-for-bit; used by the test suite). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm2Hof(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
}
