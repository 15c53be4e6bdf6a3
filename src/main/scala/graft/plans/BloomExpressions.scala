package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd bloom-filter membership probe over a broadcast
  * `util.sketch.BloomFilter` — the px103 append prefilter's second layer.
  *
  * A Scala UDF here would break whole-stage codegen on the lake-side id
  * scan (the one stage the pushed range predicate just worked to keep
  * cheap); this expression keeps the probe inside the generated loop. The
  * filter itself is built by `df.stat.bloomFilter` exactly as before, so
  * the bit pattern — and therefore the false-positive set — is unchanged.
  *
  * Semantics match the sketch API the UDF called:
  *   - long input  → `mightContainLong`
  *   - string input → `mightContainBinary(utf8 bytes)`, which is precisely
  *     what `mightContainString` hashes.
  * Null input yields null, which `filter` drops — the UDF returned false.
  */
case class BloomMightContainF(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  // constructed on unresolved children (the Column API), so the input
  // check runs at analysis time, not construction time
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType || child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects long or string input, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => bloom.value.mightContainLong(v.asInstanceOf[Long])
    case StringType => bloom.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomBc", bloom, classOf[Broadcast[_]].getName)
    val probe = child.dataType match {
      case LongType => (v: String) => s"mightContainLong($v)"
      case StringType => (v: String) => s"mightContainBinary($v.getBytes())"
    }
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = ((org.apache.spark.util.sketch.BloomFilter) $bc.value()).${probe(v)};")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
