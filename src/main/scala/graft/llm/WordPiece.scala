package graft.llm

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (Wu et al. 2016; BERT's tokenizer) — the third
  * member of the engine's subword triad, distinguished by its ENCODE
  * rule: greedy longest-match-first with "##" continuation pieces.
  * [[Bpe]] applies learned merges bottom-up, [[Unigram]] picks the
  * Viterbi-optimal segmentation; WordPiece commits to the longest
  * matching prefix at every position and emits one [UNK] for a word
  * it cannot cover. Encoding runs as the native
  * [[graft.plans.WordPieceStats]] codegen kernel — no Dataset encoder
  * boundary on the corpus scan.
  *
  * The vocabulary here is the frequency seed (top substrings by
  * corpus count, word-initial and continuation roles counted
  * separately, single characters always retained) — the
  * [[Unigram]]-seed convention: this module's substance is the greedy
  * encode semantics and its gates, not a likelihood trainer.
  */
object WordPiece {

  /** Vocab roles: word-initial pieces and "##" continuations. */
  final case class Vocab(init: Set[String], cont: Set[String],
    maxPieceLen: Int)

  /** Frequency-seeded vocabulary from the corpus: every (position,
    * length<=maxPieceLen) substring of the DISTINCT word table,
    * weighted by word frequency, counted separately per role
    * (pos == 0 -> initial); top `vocabSize` per role by (count desc,
    * piece asc), single characters always retained so training-corpus
    * words can never go [UNK].
    *
    * Scale shape: the corpus scans once into the bounded distinct-word
    * table; the substring explode is word-table-sized x L·maxPieceLen;
    * the final top-k is a bounded collect (the tokenizer-vocab
    * posture shared with [[Bpe.vocabDf]] / [[Unigram]]). */
  def seedVocab(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 8): Vocab = {
    require(vocabSize >= 1 && maxPieceLen >= 1)
    val words = docs.select(explode(Text.tokens(col(textCol))).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__cnt"))
    val pieces = words
      .withColumn("__i", explode(sequence(lit(0), length(col("__w")) - 1)))
      .withColumn("__l", explode(sequence(lit(1),
        least(lit(maxPieceLen), length(col("__w")) - col("__i")))))
      .select(substring(col("__w"), col("__i") + 1, col("__l")).as("__p"),
        (col("__i") === 0).as("__init"), col("__cnt"))
      .groupBy(col("__p"), col("__init")).agg(sum(col("__cnt")).as("__n"))
    // bounded collect: 2 x vocabSize rows + the single-char floor
    val top = pieces
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__init"))
          .orderBy(col("__n").desc, col("__p"))))
      .filter(col("__rn") <= vocabSize || length(col("__p")) === 1)
      .select(col("__p"), col("__init"))
      .collect()
    Vocab(
      init = top.filter(_.getBoolean(1)).map(_.getString(0)).toSet,
      cont = top.filter(!_.getBoolean(1)).map(_.getString(0)).toSet,
      maxPieceLen = maxPieceLen)
  }

  /** Per-doc greedy-encode stats: (n_words, n_pieces, n_unk,
    * fertility). Map-only — the kernel runs inside the projection. */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
      vocab: Vocab): DataFrame = {
    val s = graft.plans.WordPieceStats.wordpieceStats(
      Text.tokens(col(textCol)), vocab.init, vocab.cont, vocab.maxPieceLen)
    docs.select(col(idCol), s.as("__s"))
      .select(col(idCol),
        col("__s.n_words").as("n_words"),
        col("__s.n_pieces").as("n_pieces"),
        col("__s.n_unk").as("n_unk"),
        round(col("__s.n_pieces") /
          when(col("__s.n_words") > 0L, col("__s.n_words")), 6)
          .as("fertility"))
  }

  /** Reference (non-kernel) greedy piece count — spec twin. */
  private[graft] def greedyPieces(w: String, v: Vocab): Int =
    graft.plans.WordPieceUtil.pieces(w, v.init, v.cont, v.maxPieceLen)
}
