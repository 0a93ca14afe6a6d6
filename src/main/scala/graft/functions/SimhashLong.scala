package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Wide (up to 64-bit) sibling of [[SimhashText]], packed into a long.
  * Same tokenize→md5→majority-vote construction and the same bit
  * layout (bit b from hex nibble b/4, position 3 - b%4 — md5's 128
  * bits cover all 64); only the packing width differs. Exists because
  * Hamming-banded pair search ([[graft.ops.DedupOps.simhashPairs]])
  * needs block buckets with real cardinality: a 16-bit fingerprint cut
  * into 4-bit blocks has 16 possible values per block — an O(n²/16)
  * candidate blowup at scale — while 64 bits cut into 16-bit blocks
  * give 65 536 buckets per block position.
  */
case class SimhashLong(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(bits >= 1 && bits <= 64, "simhash_long bits must fit a long")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash_long"

  protected override def nullSafeEval(input: Any): Any =
    SimhashLong.compute(input.asInstanceOf[UTF8String], bits)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashLong.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimhashLong =
    copy(child = newChild)
}

object SimhashLong {

  def compute(text: UTF8String, bits: Int): Long = {
    val votes = SimhashKernel.votes(text, bits)
    var result = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) result |= 1L << b
      b += 1
    }
    result
  }
}
