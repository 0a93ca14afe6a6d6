package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-gram shingling: tokenize once, emit each window as
  * one string — the composed `transform(sequence(...), slice+concat_ws)`
  * form re-slices the token array per output position and is
  * interpreted. Fewer than n tokens → empty array (same as the composed
  * form's guard); null text → null.
  */
case class ShinglesText(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle width must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingles_text"

  protected override def nullSafeEval(input: Any): Any =
    ShinglesText.compute(input.asInstanceOf[UTF8String], n)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShinglesText.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesText =
    copy(child = newChild)
}

object ShinglesText {

  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = Md5Hex.sqlTrim(text.toString).split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}
