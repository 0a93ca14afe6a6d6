package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `size(array_intersect(a, b))` as ONE codegen'd pass that never
  * materializes the intersection array. This is the verify kernel of
  * every set-similarity join in the engine (PPJoin/MinHash/banded
  * candidates → exact Jaccard): one evaluation per candidate pair, so
  * its constant factor IS the verify stage's runtime.
  *
  * The built-in composition was measured as the near-dup families' top
  * CPU: `ArrayIntersect` over string arrays takes its interpreted
  * `evalIntersect` path even inside codegen (a Scala-closure hash-set
  * build per row with per-element boxing through
  * `SpecializedGettersReader`), then allocates the result array that
  * `size` immediately collapses to its length. This expression counts
  * with one `HashSet[UTF8String]` over the SMALLER input and
  * remove-on-hit over the other — O(|a| + |b|), no result array, no
  * boxing beyond the set entries.
  *
  * Exact `size(array_intersect)` semantics (differentially spec'd in
  * IntersectCountSpec): the count of DISTINCT common elements —
  * duplicates on either side count once, a null ELEMENT present on
  * both sides counts once, a null ARRAY yields null (as
  * `size(array_intersect(...))` does with `legacy.sizeOfNull=false`).
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType, containsNull = true),
      ArrayType(StringType, containsNull = true))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "intersect_count"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.IntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {

  /** |distinct(a) ∩ distinct(b)|, null elements counting as one value.
    * The set is built from the SMALLER side; matches REMOVE their entry
    * so a duplicated element in the probe side cannot double-count.
    */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = small.numElements()
    if (n == 0) return 0
    val set = new java.util.HashSet[UTF8String](Math.max(4, n * 2))
    var smallHasNull = false
    var i = 0
    while (i < n) {
      if (small.isNullAt(i)) smallHasNull = true
      else set.add(small.getUTF8String(i))
      i += 1
    }
    var count = 0
    val m = large.numElements()
    var j = 0
    while (j < m && (smallHasNull || !set.isEmpty)) {
      if (large.isNullAt(j)) {
        if (smallHasNull) { count += 1; smallHasNull = false }
      } else if (set.remove(large.getUTF8String(j))) count += 1
      j += 1
    }
    count
  }
}
