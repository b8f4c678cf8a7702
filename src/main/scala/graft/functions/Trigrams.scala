package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the word trigrams (3-shingles) of a string
  * array, each joined with a single space — `["a","b","c","d"]` →
  * `["a b c", "b c d"]`; fewer than 3 words → empty array.
  *
  * The composable form — `transform(sequence(0, size(w) - 3), i ->
  * concat(w[i], ' ', w[i+1], ' ', w[i+2]))` — interprets its lambda per
  * shingle (measured ~0.8 ms/doc on the fixtures, dominating x16/x14);
  * this expression runs one fused loop inside whole-stage codegen. Input
  * elements are expected non-null (`split()` output); a null word is
  * skipped by `concatWs`, matching SQL `concat_ws` semantics.
  */
case class Trigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_trigrams"

  @transient private lazy val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[ArrayData]
    val n = w.numElements()
    val m = if (n > 2) n - 2 else 0
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.concatWs(sep,
        w.getUTF8String(i), w.getUTF8String(i + 1), w.getUTF8String(i + 2))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val u = classOf[UTF8String].getName
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int $m = $n > 2 ? $n - 2 : 0;
         |$u[] $out = new $u[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $out[$i] = $u.concatWs($sepRef,
         |    $a.getUTF8String($i), $a.getUTF8String($i + 1), $a.getUTF8String($i + 2));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Trigrams =
    copy(child = newChild)
}

object Trigrams {
  /** Column API: word trigrams of an array<string> column. */
  def trigrams(w: Column): Column =
    GraftBridge.column(Trigrams(GraftBridge.expression(w)))
}
