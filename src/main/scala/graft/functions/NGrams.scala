package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the word n-grams (shingles) of a string
  * array, each joined with a single space — for n = 3,
  * `["a","b","c","d"]` → `["a b c", "b c d"]`; fewer than n words →
  * empty array.
  *
  * The composable form — `transform(sequence(0, size(w) - n), i ->
  * concat(w[i], ' ', ..., w[i+n-1]))` — interprets its lambda per shingle
  * (measured ~0.8 ms/doc on the fixtures, dominating x16/x14); this
  * expression runs one fused loop inside whole-stage codegen. `n` is a
  * plan-time constant, so the inner concat is unrolled in the generated
  * code. Input elements are expected non-null (`split()` output); a null
  * word is skipped by `concatWs`, matching SQL `concat_ws` semantics.
  *
  * Deriving shingles this way is also a SHUFFLE eliminator, not just a CPU
  * win: the posexplode + `lead` window alternative (fully codegen'd) pays a
  * per-doc shuffle+sort for the window, while `explode(ngrams(w, n))` is
  * narrow — x3/x13's first exchange disappears at any scale.
  */
case class NGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 16, s"shingle width out of range: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  @transient private lazy val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[ArrayData]
    val cnt = w.numElements()
    val m = if (cnt >= n) cnt - n + 1 else 0
    val out = new Array[AnyRef](m)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) { parts(j) = w.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val u = classOf[UTF8String].getName
      val cnt = ctx.freshName("cnt")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      // n is a plan-time constant: unroll the n-way concat
      val args = (0 until n).map(j => s"$a.getUTF8String($i + $j)").mkString(", ")
      s"""
         |int $cnt = $a.numElements();
         |int $m = $cnt >= $n ? $cnt - $n + 1 : 0;
         |$u[] $out = new $u[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $out[$i] = $u.concatWs($sepRef, $args);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)
}

object NGrams {
  /** Column API: word n-grams of an array<string> column. */
  def ngrams(w: Column, n: Int): Column =
    GraftBridge.column(NGrams(GraftBridge.expression(w), n))
}
