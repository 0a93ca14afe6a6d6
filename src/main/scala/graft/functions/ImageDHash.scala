package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-bit perceptual DIFFERENCE hash (dHash) of an encoded image:
  * sniff-and-decode the container ([[graft.ops.ImageIoCodecs.decodeAny]]
  * — BMP/PNG/JPEG), integer-grayscale, nearest-resample the gray plane
  * to 9×8, then one bit per horizontal gradient — bit (y·8 + x) set iff
  * gray(x+1, y) > gray(x, y). Every step is the engine's existing
  * integer kernel (the m6/m10 resample law, SQL-replayable), so a
  * DuckDB oracle can recompute the hash in closed form for synthetic
  * rasters.
  *
  * Perceptual, not cryptographic: a re-encode (e.g. PNG→JPEG at high
  * quality) perturbs few gradient signs, so near-duplicate detection is
  * a small-Hamming-radius search — exactly the Manku block-banding
  * machinery text SimHash already uses
  * ([[graft.ops.DedupOps.simhashPairs]]).
  *
  * Returns null for bytes no codec accepts (a real crawl has corrupt
  * images; the dedup pipeline drops them instead of failing the task).
  * Narrow and shuffle-free; one decode per row is the dominant cost, so
  * hash ONCE and band/verify on the 8-byte fingerprint downstream.
  */
case class ImageDHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_dhash"

  protected override def nullSafeEval(input: Any): Any =
    ImageDHash.compute(input.asInstanceOf[Array[Byte]])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.functions.ImageDHash.compute($c);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.longValue();
      }""")

  override protected def withNewChildInternal(newChild: Expression): ImageDHash =
    copy(child = newChild)
}

object ImageDHash {

  /** Integer grayscale: (299·r + 587·g + 114·b) / 1000 — the fixed-point
    * BT.601 weights, floor division so any engine replays it exactly.
    */
  @inline private def gray(p: Int): Int = {
    val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  def compute(bytes: Array[Byte]): java.lang.Long =
    try {
      val img = graft.ops.ImageIoCodecs.decodeAny(bytes)
      val small = graft.ops.MediaCodecs.Resample.nearest(
        img.pixels, img.width, img.height, 9, 8)
      var h = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (gray(small(y * 9 + x + 1)) > gray(small(y * 9 + x)))
            h |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      java.lang.Long.valueOf(h)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
}
