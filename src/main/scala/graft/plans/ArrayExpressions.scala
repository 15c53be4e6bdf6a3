package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Cardinality of the intersection of two SORTED array<long> columns via a
  * single merge walk — O(|a|+|b|), zero allocation. Replaces
  * `size(array_intersect(...))` (hash-set build per pair) on the n-gram
  * Jaccard hot path, where it runs once per candidate pair.
  * Inputs MUST be sorted ascending and duplicate-free (TextHash
  * .shingleHashesSorted guarantees this).
  */
case class IntersectCardSortedLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_card_sorted"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L1 (Manhattan) distance of two array<int> count histograms — Σ|a_i-b_i|,
  * positions beyond the shorter array read as 0. One pass, zero allocation.
  * Built for count-filter prefiltering: a gram bag projected onto a small
  * hash-bucket histogram keeps the Gravano edit-distance bound (L1 of the
  * projection ≤ L1 of the bags ≤ 2·d·q), so comparing 64 ints prunes most
  * pairs before the O(|a|+|b|) full merge walk runs. */
case class L1DistInt(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_l1_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.max(nx, ny)
    var i = 0
    var s = 0
    while (i < n) {
      val xv = if (i < nx) x.getInt(i) else 0
      val yv = if (i < ny) y.getInt(i) else 0
      s += math.abs(xv - yv)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = $nx > $ny ? $nx : $ny;
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $d = ($i < $nx ? $a.getInt($i) : 0) - ($i < $ny ? $b.getInt($i) : 0);
         |  $s += $d < 0 ? -$d : $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
