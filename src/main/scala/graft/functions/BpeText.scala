package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Merge-table-driven byte-pair encoding (the tokenization every LLM
  * pipeline bills by): whitespace pre-tokenize, then per word run the
  * textbook greedy loop — find the LOWEST-RANKED adjacent token pair
  * present, merge all its occurrences left-to-right non-overlapping,
  * repeat until no ranked pair remains. Characters not reachable by any
  * merge stay single-character tokens (no unk).
  *
  * The merge table must be a LEARNED-shape list: every multi-character
  * pair component is the output of an earlier merge (validated at
  * construction). That property is what makes greedy equal to
  * "apply merges in rank order, each to fixpoint" — applying merge j
  * can only create adjacencies involving its output t_j, and t_j can
  * only be a component of a LATER merge, so earlier pairs never
  * reappear. The DuckDB oracle replays exactly that rank-order
  * fixpoint over separator-joined characters (recursive CTE), and
  * BpeTextSpec holds the two algorithms equal on the corpus vocabulary
  * plus adversarial fixtures.
  */
final class BpeModel(val merges: Seq[(String, String)]) extends Serializable {
  require(merges.nonEmpty, "empty merge table")
  // learned-shape validation: creator-before-user
  locally {
    val created = scala.collection.mutable.Set.empty[String]
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      Seq(l, r).foreach { c =>
        require(c.length == 1 || created.contains(c),
          s"merge $i ($l, $r): component '$c' is not a single char and not " +
            "the output of an earlier merge — not a learned-shape table")
      }
      created += l + r
    }
  }

  private val ranks: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer]()
    merges.zipWithIndex.foreach { case (p, i) => m.put(p, i) }
    m
  }

  /** Word-level memo: corpus vocabularies are tiny next to corpus size,
    * so per-JVM memoization turns the per-row cost into a hash probe.
    * Bounded (clear-on-full) so a pathological unique-word stream cannot
    * grow it without limit.
    */
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val MemoCap = 1 << 16

  /** Greedy BPE encode of one word (no whitespace inside).
    *
    * Pathological-length guard: the greedy loop is O(L²) in the word
    * length (each iteration scans all pairs and shortens by ≥1), so a
    * single multi-hundred-KB "word" — corrupt data, base64 blobs —
    * would stall an executor core. Words beyond [[BpeModel.MaxWordChars]]
    * are encoded in independent segments of that size (deterministic,
    * order-preserving; merges never cross segment boundaries). Real
    * tokenizers bound single-token-run length the same way via their
    * pre-tokenizer regex; any linguistic word is far below the cap.
    */
  def encode(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    if (word.length > BpeModel.MaxWordChars)
      return word.grouped(BpeModel.MaxWordChars).flatMap(encode).toArray
    val cached = memo.get(word)
    if (cached != null) return cached
    var toks: Array[String] = word.map(_.toString).toArray
    var done = false
    while (!done && toks.length > 1) {
      // lowest-ranked pair present
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.get((toks(i), toks(i + 1)))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, r) = merges(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == l && toks(j + 1) == r) {
            out += l + r; j += 2
          } else {
            out += toks(j); j += 1
          }
        }
        toks = out.toArray
      }
    }
    if (memo.size >= MemoCap) memo.clear()
    memo.put(word, toks)
    toks
  }

  /** Encode whitespace-separated text: concatenated per-word token
    * streams (no cross-word merges — words are hard boundaries, the
    * standard pre-tokenization contract).
    */
  def encodeText(text: String): Array[String] = {
    val words = Md5Hex.sqlTrim(text).split("\\s+", -1)
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) out ++= encode(words(i))
      i += 1
    }
    out.toArray
  }

  def countText(text: String): Long = {
    val words = Md5Hex.sqlTrim(text).split("\\s+", -1)
    var n = 0L
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) n += encode(words(i)).length
      i += 1
    }
    n
  }
}

object BpeModel {
  /** Per-word greedy-encode length cap (see [[BpeModel.encode]]):
    * 8 KiB keeps the O(L²) worst case near 10⁷ char ops per segment.
    */
  val MaxWordChars: Int = 8192
}

/** The engine's built-in fixture vocabulary: 40 merges learned by
  * standard BPE training (max-frequency pair, lexicographic tie-break)
  * over the sf0.1 documents word frequencies at character level. The
  * SAME table is inlined in the x22/x9b oracle SQL — the table IS the
  * parity contract, like the code-system tables in [[graft.codes.Codes]].
  */
object BpeVocab {
  val DefaultMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "r"), ("s", "t"), ("o", "w"),
    ("t", "a"), ("l", "u"), ("m", "er"), ("a", "r"), ("p", "ar"),
    ("u", "p"), ("par", "k"), ("s", "park"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("g", "e"), ("mer", "ge"), ("b", "l"), ("bl", "e"),
    ("ta", "ble"), ("c", "o"), ("co", "lu"), ("colu", "m"), ("colum", "n"),
    ("c", "t"), ("ct", "or"), ("e", "ctor"), ("v", "ector"), ("a", "m"),
    ("e", "am"), ("r", "eam"), ("st", "ream"), ("a", "lu"), ("alu", "e"),
    ("v", "alue"), ("a", "ta"), ("d", "ata"), ("a", "l"), ("al", "l"))

  val Default: BpeModel = new BpeModel(DefaultMerges)

  /** The merge table as a SQL VALUES list for the DuckDB oracles. */
  def mergesValuesSql: String = DefaultMerges.zipWithIndex
    .map { case ((l, r), i) => s"(${i + 1},'$l','$r')" }
    .mkString(", ")
}

/** BPE token count per row — the token-budget unit for packing/billing.
  * One codegen'd pass, memoized per word.
  */
case class BpeCountText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_count_text"

  protected override def nullSafeEval(input: Any): Any =
    BpeCountText.compute(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeCountText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeCountText =
    copy(child = newChild)
}

object BpeCountText {
  def compute(text: UTF8String): Long =
    BpeVocab.Default.countText(text.toString)
}

/** Full BPE token stream per row (array<string>), word-boundary
  * preserving order.
  */
case class BpeTokensText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_tokens_text"

  protected override def nullSafeEval(input: Any): Any =
    BpeTokensText.compute(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeTokensText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokensText =
    copy(child = newChild)
}

object BpeTokensText {
  def compute(text: UTF8String): ArrayData = {
    val toks = BpeVocab.Default.encodeText(text.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}
