package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit hashes of a string's SymSpell deletion neighborhood (the
  * string itself, every single-code-point deletion, and for k = 2 every
  * two-code-point deletion) WITHOUT materializing a single variant
  * string. Deletions are counted in Unicode code points — matching
  * Spark's substring/length/levenshtein semantics — so supplementary
  * (non-BMP) characters cost one deletion, not two.
  *
  * The composed form — `explode(array_distinct(concat(transform(
  * sequence(...), substr+concat))))` then `xxhash64` — is interpreted
  * (higher-order functions are CodegenFallback) and allocates
  * O(len²) UTF8 strings per row; at 40-char prefixes that is ~820
  * string builds per document and measured 6.5 s of the d10 battery
  * row's 18 s at sf0.1. This expression computes each variant's hash
  * by POLYNOMIAL COMPOSITION over precomputed prefix hashes
  * (hash(a ++ b) = hash(a)·B^|b| + hash(b), mod 2⁶⁴ by Long wrap), so
  * a variant costs a few multiplications — no allocation at all —
  * and equal variant STRINGS get equal hashes by the homomorphism, so
  * the bucket structure downstream is exactly the string form's.
  * Structured collisions beyond equality only ADD candidates, which
  * the exact levenshtein verify rejects (the same contract xxhash64
  * had).
  *
  * Output is the DISTINCT hash set (sorted ascending — sort + unique
  * replaces the string form's array_distinct).
  */
case class DeletionHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1 && k <= 2, s"deletion depth in 1..2, got $k")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "deletion_hashes"

  protected override def nullSafeEval(input: Any): Any =
    DeletionHashes.compute(input.asInstanceOf[UTF8String], k)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeletionHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): DeletionHashes =
    copy(child = newChild)
}

object DeletionHashes {

  private val B = 1099511628211L    // FNV-64 prime (odd -> invertible mod 2^64)
  private val Seed = 1125899906842597L

  def compute(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    // Deletion unit is the Unicode CODE POINT, not the UTF-16 unit:
    // Spark's substring/length/levenshtein (the string-form
    // deletionNeighborhood and editDistanceJoin's verify + band prune)
    // all count code points, so a supplementary character (2 UTF-16
    // units) must cost exactly ONE deletion here too or candidate
    // generation would silently miss astral-text pairs.
    val n = s.codePointCount(0, s.length)
    val cp = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < s.length) {
      val c = s.codePointAt(off)
      cp(ci) = c
      ci += 1
      off += Character.charCount(c)
    }
    // prefix hashes over code points (+1 so NUL still advances the
    // state): P(0) = Seed, P(i+1) = P(i)·B + (cp_i + 1); hash of the
    // segment [a, b) continued from state h is
    // h·B^(b−a) + (P(b) − P(a)·B^(b−a)) — a homomorphism, so any
    // concatenation of segments hashes as if the variant string had
    // been built and hashed directly.
    val p = new Array[Long](n + 1)
    val pw = new Array[Long](n + 1)
    p(0) = Seed
    pw(0) = 1L
    var i = 0
    while (i < n) {
      p(i + 1) = p(i) * B + (cp(i).toLong + 1L)
      pw(i + 1) = pw(i) * B
      i += 1
    }
    @inline def seg(h: Long, a: Int, b: Int): Long =
      h * pw(b - a) + (p(b) - p(a) * pw(b - a))
    val total = 1 + n + (if (k == 2) n * (n - 1) / 2 else 0)
    val out = new Array[Long](total)
    var m = 0
    out(m) = p(n); m += 1                       // the string itself
    i = 0
    while (i < n) {                              // delete position i
      out(m) = seg(seg(Seed, 0, i), i + 1, n); m += 1
      i += 1
    }
    if (k == 2) {
      i = 0
      while (i < n) {                            // delete i < j
        var j = i + 1
        while (j < n) {
          out(m) = seg(seg(seg(Seed, 0, i), i + 1, j), j + 1, n); m += 1
          j += 1
        }
        i += 1
      }
    }
    // distinct (equal variant strings hash equal by the homomorphism)
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }
}
