package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: banded hyperplane sign-LSH values of a
  * double-array embedding — band k holds `bits` sign bits of dims
  * [k·bits, (k+1)·bits), LSB-first.
  *
  * The composable form — `transform(sequence(0, bands-1), k ->
  * aggregate(sequence(0, bits-1), 0L, ...))` — interprets two nested
  * lambdas per row; this expression generates one fused nested loop inside
  * whole-stage codegen. At fixture scale the difference is noise; on a real
  * embedding corpus it is per-row interpreter overhead on every vector.
  * Bit semantics are identical to the HOF (strictly-positive test,
  * out-of-range dims contribute 0), asserted by a property test.
  */
case class SignBands(child: Expression, bands: Int, bits: Int)
  extends UnaryExpression {

  require(bands > 0 && bits > 0 && bits <= 63, s"bad banding $bands x $bits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sign_bands"

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    val n = emb.numElements()
    val out = new Array[Long](bands)
    var k = 0
    while (k < bands) {
      var v = 0L
      var j = 0
      while (j < bits) {
        val idx = k * bits + j
        if (idx < n && emb.getDouble(idx) > 0.0) v |= (1L << j)
        j += 1
      }
      out(k) = v
      k += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$bands];
         |for (int $k = 0; $k < $bands; $k++) {
         |  long $v = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    int $idx = $k * $bits + $j;
         |    if ($idx < $n && $a.getDouble($idx) > 0.0) $v |= (1L << $j);
         |  }
         |  $out[$k] = $v;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBands =
    copy(child = newChild)
}

object SignBands {
  /** Column API: sign-LSH band values of an array<double> column. */
  def signBands(emb: Column, bands: Int, bits: Int): Column =
    GraftBridge.column(SignBands(GraftBridge.expression(emb), bands, bits))
}
