package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text→MinHash-signature expression: whitespace-tokenize, form
  * word n-gram shingles, md5 each shingle once, keep k running minima of
  * its disjoint 4-hex-char slices — all in ONE codegen'd pass with no
  * intermediate arrays. Semantics identical to
  * `MinhashSlices(TextOps.shingles(text, n), k)` (and to the DuckDB
  * oracle built from split_regex + md5 + list_sort), but skips the
  * interpreted higher-order `transform`/`slice` chain that dominates the
  * composed form's runtime. Null/too-short text (fewer than n tokens) →
  * null.
  */
case class MinhashText(child: Expression, n: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle width must be >= 1")
  require(k >= 1 && k <= 8, "md5 yields 32 hex chars = at most 8 slices of 4")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_text"

  protected override def nullSafeEval(input: Any): Any =
    MinhashText.compute(input.asInstanceOf[UTF8String], n, k)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinhashText.compute($c, $n, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashText =
    copy(child = newChild)
}

object MinhashText {

  /** Called from both interpreted eval and generated code. Tokenization
    * matches `split(trim(text), "\\s+")` with SQL trim semantics
    * (spaces only — Java's String.trim strips tabs/newlines and would
    * silently diverge from the composed form and the oracle); an empty
    * string yields one empty token, like Spark's split.
    */
  def compute(text: UTF8String, n: Int, k: Int): ArrayData = {
    val toks = Md5Hex.sqlTrim(text.toString).split("\\s+", -1)
    val nShingles = toks.length - n + 1
    if (nShingles <= 0) return null
    val minima = new Array[UTF8String](k)
    val hex = new Array[Char](32)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(toks(i + t))
        t += 1
      }
      Md5Hex.digestInto(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8), hex)
      var j = 0
      while (j < k) {
        val slice = UTF8String.fromString(new String(hex, 4 * j, 4))
        if (minima(j) == null || slice.compareTo(minima(j)) < 0) minima(j) = slice
        j += 1
      }
      i += 1
    }
    new GenericArrayData(minima.asInstanceOf[Array[Any]])
  }
}
