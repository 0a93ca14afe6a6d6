package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd product-quantization encoder: one pass over the vector,
  * returning the array of per-block nearest-sub-centroid indices. The
  * composed form (argmin over `aggregate(zip_with(...))` distances) is
  * interpreted and evaluates m×k higher-order folds PER ROW (128 at
  * m=8, k=16); this is one compiled loop with the codebooks held as a
  * plan reference object. Ties break to the lower index, same as the
  * struct-min composition. Null vector → null; a vector shorter than
  * m×blockLen or containing a null element → null.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with ExpectsInputTypes {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "at least one non-empty codebook required")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  protected override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], codebooks)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val books = ctx.addReferenceObj("codebooks", codebooks,
      "double[][][]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.functions.PqEncode.compute($c, $books);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {

  def compute(v: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val blockLen = books(0)(0).length
    if (v.numElements() < m * blockLen) return null
    val code = new Array[Int](m)
    var b = 0
    while (b < m) {
      val cents = books(b)
      val off = b * blockLen
      var best = 0
      var bestD = Double.PositiveInfinity
      var i = 0
      while (i < cents.length) {
        val c = cents(i)
        var d = 0.0
        var j = 0
        while (j < blockLen) {
          if (v.isNullAt(off + j)) return null
          val diff = v.getDouble(off + j) - c(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      code(b) = best
      b += 1
    }
    new GenericArrayData(code)
  }
}
