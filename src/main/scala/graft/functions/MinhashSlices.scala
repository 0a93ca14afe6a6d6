package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash-signature expression: ONE pass over the shingle array
  * computing, per shingle, a single md5 and k running minima of its
  * disjoint 4-hex-char slices. Matches the semantics of
  * `array_min(transform(shingles, s => substring(md5(s), 1+4j, 4)))` for
  * j < k — the form DuckDB oracles can also express — but without the
  * interpreted higher-order functions (CodegenFallback in Spark) and
  * without the k-fold re-hash or an explode+aggregate shuffle: a custom
  * `Expression` with `doGenCode` keeps the whole signature inside
  * whole-stage codegen, so MinHash at 100 TB is a pure narrow map.
  *
  * Returns null for a null or empty array (a doc with fewer tokens than
  * the shingle width has no signature — same rows the explode form
  * drops).
  */
case class MinhashSlices(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1 && k <= 8, "md5 yields 32 hex chars = at most 8 slices of 4")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_slices"

  protected override def nullSafeEval(input: Any): Any =
    MinhashSlices.compute(input.asInstanceOf[ArrayData], k)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinhashSlices.compute($c, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSlices =
    copy(child = newChild)
}

object MinhashSlices {

  /** Called from both interpreted eval and generated code. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val minima = new Array[UTF8String](k)
    val hex = new Array[Char](32)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        Md5Hex.digestInto(s.getBytes, hex)
        var j = 0
        while (j < k) {
          val slice = UTF8String.fromString(new String(hex, 4 * j, 4))
          if (minima(j) == null || slice.compareTo(minima(j)) < 0) minima(j) = slice
          j += 1
        }
      }
      i += 1
    }
    if (minima(0) == null) null
    else new GenericArrayData(minima.asInstanceOf[Array[Any]])
  }
}
