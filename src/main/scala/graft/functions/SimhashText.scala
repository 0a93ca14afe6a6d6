package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text→SimHash expression: whitespace-tokenize, md5 each token
  * ONCE, accumulate the ±1 majority vote for all `bits` hash bits in a
  * single pass, emit the packed int. Bit b is read from hex nibble
  * (b / 4), position (3 - b % 4) — the same layout as the composed
  * Catalyst form in DedupOps.simhash16 and the SQL oracle. The composed
  * higher-order `aggregate` fold is interpreted AND replayed once per
  * bit (16 re-hashes of every token); this is one codegen'd pass.
  * Null text → null; zero tokens never happens (split of an empty
  * string yields one empty token, which hashes like any other — same as
  * the oracle).
  */
case class SimhashText(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(bits >= 1 && bits <= 32, "simhash bits must fit an int (md5 has 128)")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash_text"

  protected override def nullSafeEval(input: Any): Any =
    SimhashText.compute(input.asInstanceOf[UTF8String], bits)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashText.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimhashText =
    copy(child = newChild)
}

object SimhashText {

  def compute(text: UTF8String, bits: Int): Int = {
    val votes = SimhashKernel.votes(text, bits)
    var result = 0
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) result |= 1 << b
      b += 1
    }
    result
  }
}

/** The ONE copy of the tokenize→md5→majority-vote kernel both packing
  * widths ([[SimhashText]] → int, [[SimhashLong]] → long) share. The
  * trim/split semantics and the nibble bit layout (bit b from hex char
  * b/4, position 3 − b%4) are oracle-load-bearing for d3/d7 and the
  * composed form in DedupOps — a fix here reaches both expressions, so
  * the `simhash64 low bits == simhash16` invariant cannot silently
  * diverge.
  */
private[functions] object SimhashKernel {

  def votes(text: UTF8String, bits: Int): Array[Int] = {
    // SQL trim semantics + limit -1, matching split(trim(text), "\s+")
    val toks = Md5Hex.sqlTrim(text.toString).split("\\s+", -1)
    val votes = new Array[Int](bits)
    val hex = new Array[Char](32)
    var i = 0
    while (i < toks.length) {
      Md5Hex.digestInto(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8), hex)
      var b = 0
      while (b < bits) {
        // bit b lives in hex char (b/4), position (3 - b%4) of its nibble
        val nibble = Character.digit(hex(b / 4), 16)
        val bit = (nibble >> (3 - (b % 4))) & 1
        votes(b) += (if (bit == 1) 1 else -1)
        b += 1
      }
      i += 1
    }
    votes
  }
}
