package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary TRAINING — learns the merge table that
  * [[graft.functions.BpeModel]] encodes with, from the corpus itself
  * (the fixture table in [[graft.functions.BpeVocab]] was learned
  * offline by exactly this algorithm; an LLM-data user tokenizes with a
  * vocabulary trained on their own data).
  *
  * Algorithm (standard character-level BPE, Sennrich-style): build the
  * corpus WORD HISTOGRAM once (one shuffle over the corpus — the only
  * corpus-sized pass), then per merge round over the vocabulary-sized
  * state table: count adjacent token pairs at every position (overlap
  * counting), weighted by word frequency; pick the max-count pair with
  * lexicographic (l, r) tie-break; merge all its occurrences in every
  * word left-to-right non-overlapping; repeat.
  *
  * Scale design (the n6/g4 iterative pattern): after the histogram
  * shuffle, every round runs over the VOCABULARY-sized state table —
  * one explode + groupBy per round, a 1-row argmax collect (the
  * bounded-driver exception class), a narrow string `replace`, and a
  * `localCheckpoint` so round k never re-derives rounds 1..k-1 (same
  * lineage-cap discipline as pagerankMicro). Nothing is ever
  * corpus × rounds.
  *
  * State representation: a word's token sequence is rendered as a
  * string with every token wrapped in its OWN spaces — `" t1  t2 "`
  * (double space between tokens). Because adjacent tokens share no
  * delimiter character, one left-to-right non-overlapping
  * `replace(" l  r ", " lr ")` pass equals the greedy merge loop of
  * [[graft.functions.BpeModel.encode]] exactly — including on repeated
  * runs like "aaaaa", where a SHARED single-space delimiter would skip
  * the middle pair (the matched trailing space consumes the next
  * pair's leading space). Merging (l, r) can never create a new (l, r)
  * adjacency (the merged token is strictly longer than either side),
  * so one pass per round is a fixpoint. Tokens contain no whitespace
  * (words come from a `\s+` split), so the delimiter is unambiguous.
  */
object BpeTrainOps {

  /** One trained merge round: 1-based rank, pair, weighted pair count
    * at selection time.
    */
  final case class MergeRound(rank: Int, l: String, r: String, cnt: Long)

  /** Learn `nMerges` BPE merges from the corpus. Returns the rounds in
    * rank order (driver-side — bounded by nMerges, like every other
    * bounded collect in the engine); stops early if the vocabulary
    * exhausts (every word fully merged). The pair list feeds
    * `new BpeModel(rounds.map(r => (r.l, r.r)))` — learned-shape by
    * construction.
    */
  def bpeTrain(docs: DataFrame, textCol: String, nMerges: Int): Seq[MergeRound] = {
    require(nMerges >= 1 && nMerges <= 4096, s"nMerges in 1..4096, got $nMerges")
    // corpus word histogram — the ONE corpus-sized pass
    val wf = docs
      .select(explode(split(trim(col(s"`$textCol`")), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
    // initial state: every char its own token, own-space rendering
    val state0 = wf.select(
        concat(lit(" "), array_join(split(col("w"), ""), "  "), lit(" ")).as("s"),
        col("f"))
      .localCheckpoint()
    trainRounds(state0, nMerges)
  }

  /** BYTE-level BPE training with GPT-2 regex pre-tokenization
    * ([[graft.functions.BytePreTok]]): the histogram keys are
    * pre-tokens (leading spaces included), and the merge alphabet is
    * their UTF-8 BYTES — so the learned table feeds
    * [[graft.functions.ByteBpeModel]] and any UTF-8 corpus trains
    * losslessly. Same per-round machinery as [[bpeTrain]]; state tokens
    * are rendered as two-char HEX bytes (hex never contains the space
    * delimiter, even though pre-tokens do), and the returned pair
    * strings are decoded back to latin-1 byte strings. Tie-break is
    * bytewise-lexicographic (hex order = byte order).
    */
  def bpeTrainBytes(docs: DataFrame, textCol: String, nMerges: Int): Seq[MergeRound] = {
    require(nMerges >= 1 && nMerges <= 4096, s"nMerges in 1..4096, got $nMerges")
    val wf = docs
      .select(explode(regexp_extract_all(col(s"`$textCol`"),
        lit(graft.functions.BytePreTok.PatternString), lit(0))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
    val hx = hex(encode(col("w"), "UTF-8"))
    val toks = transform(
      sequence(lit(1), (length(hx) / lit(2)).cast("int")),
      i => substring(hx, i * 2 - 1, lit(2)))
    val state0 = wf.select(
        concat(lit(" "), array_join(toks, "  "), lit(" ")).as("s"), col("f"))
      .localCheckpoint()
    trainRounds(state0, nMerges)
      .map(m => m.copy(l = unhexLatin1(m.l), r = unhexLatin1(m.r)))
  }

  private def unhexLatin1(h: String): String =
    h.grouped(2).map(p => Integer.parseInt(p, 16).toChar).mkString

  /** The shared per-round loop over a (s, f) state table (own-spaces
    * token rendering — see the object scaladoc).
    */
  private def trainRounds(state0: DataFrame, nMerges: Int): Seq[MergeRound] = {
    var state = state0
    val rounds = Seq.newBuilder[MergeRound]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val toks = split(trim(col("s")), "  ")
      val best = state.select(toks.as("t"), col("f"))
        .where(size(col("t")) >= 2)
        .select(col("f"), explode(transform(
          sequence(lit(0), size(col("t")) - 2),
          i => struct(element_at(col("t"), i + 1).as("l"),
            element_at(col("t"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("f")).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect() // exactly one row — bounded argmax
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        rounds += MergeRound(rank, l, r, cnt)
        // localCheckpoint (eager) caps the lineage at one round — the
        // superseded round's blocks are released by the context cleaner
        // when the old plan goes out of scope (same in-loop discipline
        // as pagerankMicro)
        state = state.select(
            replace(col("s"), lit(s" $l  $r "), lit(s" $l$r ")).as("s"),
            col("f"))
          .localCheckpoint()
        rank += 1
      }
    }
    rounds.result()
  }

  /** [[bpeTrain]] as a DataFrame (rank, l, r, cnt) — the battery /
    * Verify surface.
    */
  def bpeTrainDF(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrain(docs, textCol, nMerges)
      .map(m => (m.rank.toLong, m.l, m.r, m.cnt))
      .toDF("rank", "l", "r", "cnt")
  }
}
