package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data-pipeline surface
  * (SURVEY.md §7.1 `llm/`): tokenization, fingerprinting, quality scoring,
  * language ID. Everything is built from codegen'd Catalyst built-ins —
  * no UDFs — so these stay inside whole-stage codegen at 100 TB.
  */
object Text {

  /** Whitespace-collapse normalization: trim + any run of whitespace → one
    * space. Shared by fingerprinting and tokenization so both agree.
    */
  def normWs(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column =
    split(normWs(text), " ")

  /** Single-pass counts backing the quality metrics —
    * [n_tokens, n_stopword_tokens, n_body_chars, n_punct_chars] via the
    * native [[graft.plans.TextStats]] kernel (one string scan instead
    * of several regex passes + an interpreted HOF stopword filter;
    * TextStatsSpec proves count-equality with those column forms).
    * Identical instances of this subtree CSE within a projection, so a
    * block computing all four metrics still scans each doc once. */
  private def textStats(text: Column): Column =
    graft.plans.TextStatsExpr.textStats(text)

  /** Token count (0 for empty/blank text). */
  def tokenCount(text: Column): Column =
    element_at(textStats(text), 1).cast("int")

  /** Intra-document token repetition ratio in [0,1]:
    * 1 - distinct_tokens/total_tokens (0 = all tokens distinct). The
    * Gopher/RefinedWeb-style repetition quality signal — highly
    * repetitive documents are boilerplate/spam candidates for a
    * training-data filter. 0.0 for empty text. */
  def repetitionRatio(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0)).otherwise(
      round(lit(1.0) -
        size(array_distinct(tokens(text))).cast("double") /
        size(tokens(text)), 6))

  /** Gopher A1.1 repetition + alpha-word signals as one array column
    * — [top2, top3, top4, dup5..dup10, alpha_frac], definitions in
    * [[graft.plans.RepetitionStatsUtil]]. One kernel scan per document
    * (map-only, no shuffle); the n-gram signals catch phrase-cycling
    * boilerplate the unigram [[repetitionRatio]] cannot see. */
  def gopherRepetition(text: Column): Column =
    graft.plans.RepetitionStatsExpr.repetitionStats(text)

  /** A BPE-ish sub-word segmentation: split on whitespace AND on
    * letter/digit/punctuation boundaries (approximates byte-pair merge
    * boundaries well enough for cost estimation). */
  def subwordTokens(text: Column): Column =
    filter(
      split(regexp_replace(lower(text),
        "(\\d+|[^\\s\\p{L}\\p{N}])", " $1 "), "\\s+"),
      t => length(t) > 0)

  /** Document fingerprint: md5 of the lower-cased, whitespace-normalized
    * text. The canonical exact-dedup key for the `documents` table. */
  def fingerprint(text: Column): Column =
    md5(lower(normWs(text)))

  /** Word n-gram shingles of the normalized, lower-cased text (n-gram
    * Jaccard / MinHash input): a length-(n) sliding window over the
    * token array — pure codegen, no explode until the caller decides.
    * Window positions come from index arithmetic (`sequence` over the
    * valid starts); the earlier transform-all-then-refilter form
    * re-regex-split every emitted shingle and was the single hottest
    * expression in the jaccard pipeline (~3x the join cost). */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(split(lower(normWs(text)), " "), n)

  /** Shingles over an ALREADY-MATERIALIZED token array column. Callers
    * doing heavy downstream work (minhash, jaccard) must project the
    * token array into a named column first: Catalyst does not CSE a
    * non-trivial expression referenced inside lambda bodies, so an
    * inlined split() re-runs its regex once per emitted shingle/hash
    * (measured 5-60x overhead). */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    array_distinct(shinglesAllFromTokens(toks, n))

  /** Like [[shinglesFromTokens]] but WITH multiplicity — one entry per
    * window position. Frequency analysis (corpus phrase counts,
    * repetition masses) needs occurrences; the distinct form is for
    * set semantics (MinHash, Jaccard). */
  def shinglesAllFromTokens(toks: Column, n: Int): Column = {
    val starts = when(size(toks) >= n,
      sequence(lit(1), size(toks) - (n - 1))).otherwise(array())
    transform(starts, i => concat_ws(" ", slice(toks, i, lit(n))))
  }

  /** [[shinglesAllFromTokens]] over the normalized lower-cased text. */
  def shinglesAll(text: Column, n: Int): Column =
    shinglesAllFromTokens(split(lower(normWs(text)), " "), n)

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): hash every character k-gram of the normalized text,
    * then keep the minimum hash of each w-wide window of consecutive
    * k-gram hashes. Guarantees any shared substring of length >= w+k-1
    * contributes at least one common fingerprint — the partial-overlap
    * detector that whole-document md5 cannot be. Returns a distinct
    * array of fingerprint hashes.
    *
    * Staged-column note applies (lambda CSE): pass a MATERIALIZED
    * normalized-text column for table-scale use. */
  /** k-gram hash array of an ALREADY-MATERIALIZED normalized-text
    * column (stage 1 of winnowing). */
  def kgramHashes(norm: Column, k: Int): Column = {
    val nGrams = greatest(length(norm) - (k - 1), lit(0))
    transform(
      when(nGrams > 0, sequence(lit(1), nGrams)).otherwise(array()),
      i => xxhash64(norm.substr(i, lit(k))))
  }

  /** Window-minimum selection over an ALREADY-MATERIALIZED k-gram hash
    * array column (stage 2 of winnowing). */
  def winnowMins(grams: Column, w: Int): Column = {
    val nWins = greatest(size(grams) - (w - 1), lit(0))
    array_distinct(transform(
      when(nWins > 0, sequence(lit(1), nWins)).otherwise(array()),
      i => array_min(slice(grams, i, lit(w)))))
  }

  /** Column convenience form for small/single-use contexts; for table
    * scale, stage [[kgramHashes]] and [[winnowMins]] over materialized
    * columns (lambda CSE — see shinglesFromTokens). */
  def winnowingFingerprints(text: Column, k: Int, w: Int): Column =
    winnowMins(kgramHashes(lower(normWs(text)), k), w)

  // --- quality scoring (length / punctuation / stopword ratios) ---

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "that", "this")

  /** Fraction of tokens that are stopwords (0 when no tokens). */
  def stopwordRatio(text: Column): Column = {
    val s = textStats(text)
    when(element_at(s, 1) === 0, lit(0.0)).otherwise(
      element_at(s, 2).cast("double") / element_at(s, 1).cast("double"))
  }

  /** Fraction of non-space characters that are not letters or digits. */
  def punctRatio(text: Column): Column = {
    val s = textStats(text)
    when(element_at(s, 3) === 0, lit(0.0)).otherwise(
      element_at(s, 4).cast("double") / element_at(s, 3).cast("double"))
  }

  /** Mean token length in characters (0 when no tokens). */
  def meanTokenLen(text: Column): Column = {
    val s = textStats(text)
    when(element_at(s, 1) === 0, lit(0.0)).otherwise(
      element_at(s, 3).cast("double") / element_at(s, 1).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards mid-range length, some
    * stopwords, little punctuation. Deterministic, oracle-expressible. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(100.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    val punctPenalty = least(punctRatio(text) * lit(2.0), lit(1.0))
    round(lit(0.5) * lenScore + lit(0.5) * stopScore
      - lit(0.25) * punctPenalty, 6)
  }

  // --- PII redaction (training-data scrubbing) ---

  /** PII patterns, deliberately RE2-compatible (no lookaround, no
    * backreferences) so the exact same pattern strings run under
    * Java regex here and RE2-based engines (the oracle) identically. */
  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ssnRe: String = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val phoneRe: String = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** Scrub emails / SSN-shaped ids / phone numbers with typed
    * placeholder tags — the standard pre-training redaction pass.
    * SSNs are replaced before phones (both are digit runs; the order
    * makes the composition deterministic). Pure codegen'd
    * regexp_replace chain: map-side only, no shuffle, safe to run
    * inline in any 100 TB scan. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ssnRe, "<SSN>"),
      phoneRe, "<PHONE>")

  /** Number of PII matches [[redactPii]] would scrub (audit metric). */
  def piiCount(text: Column): Column =
    regexp_count(text, lit(emailRe)) +
      regexp_count(text, lit(ssnRe)) +
      regexp_count(text, lit(phoneRe))

  // --- language ID (marker-word heuristic) ---

  /** Marker stopwords per language for the n-gram-free heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  private def markerHits(text: Column, markers: Seq[String]): Column = {
    val toks = tokens(lower(text))
    size(filter(toks, t => t.isin(markers.map(lit(_)): _*)))
  }

  /** Predicted language: argmax of marker-word hit counts, first-listed
    * language wins ties, "und" (undetermined) when all scores are zero.
    * Deterministic and expressible as a CASE chain for the oracle. */
  def languageId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, ms) => lang -> markerHits(text, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), els) =>
      when(s === best && s > 0, lit(lang)).otherwise(els)
    }
  }

  /** Letter-run words of the lowercased text — the readability
    * tokenization ("don't" counts as two vowel-bearing runs; digits and
    * punctuation never form words). Kept separate from [[tokens]],
    * whose whitespace convention the quality metrics pin. */
  private def letterWords(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), w => length(w) > 0)

  /** Per-word syllable estimate: count of vowel GROUPS ([aeiouy]+),
    * floored at 1 — the classic cheap approximation ("beautiful" →
    * eau+i+u = 3, "the" → 1, consonant-only tokens → 1). */
  private def syllables(w: Column): Column =
    greatest(size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))), lit(1))

  /** Flesch reading-ease components: [n_words, n_sentences,
    * n_syllables] as ints. Sentences = terminal-punctuation runs
    * ([.!?]+), floored at 1 so fragments still score. Map-only — one
    * projection, regex + array HOFs, no shuffle, and every piece is in
    * the Java∩RE2∩oracle-SQL regex subset (the [[graft.llm.Pii]]
    * dialect discipline). */
  def fleschCounts(text: Column): Column = {
    val ws = letterWords(text)
    array(
      size(ws),
      greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1)),
      aggregate(ws, lit(0), (acc, w) => acc + syllables(w)))
  }

  /** The ease score from an already-materialized [[fleschCounts]]
    * column. Callers selecting counts AND score should materialize
    * the counts array in ONE projection and derive from it — inlining
    * [[fleschCounts]] several times into one projection trips a
    * Spark whole-stage-codegen subexpression bug ("isNull_N is not
    * an rvalue", the repeated HOF subtree) and silently drops the
    * stage to interpreted execution (r13, found via the fallback
    * sweep). */
  def fleschFromCounts(c: Column): Column = {
    val nw = greatest(element_at(c, 1), lit(1)).cast("double")
    val ns = element_at(c, 2).cast("double")
    val sy = element_at(c, 3).cast("double")
    lit(206.835) - lit(1.015) * (nw / ns) - lit(84.6) * (sy / nw)
  }

  /** Flesch reading ease: 206.835 - 1.015·(words/sentences) -
    * 84.6·(syllables/words) — the document-complexity quality signal
    * (a curation filter axis alongside [[qualityScore]]: very low
    * scores flag legalese/boilerplate, implausibly high ones flag
    * word-salad). Words floor at 1 so empty text scores finitely.
    * Prefer [[fleschFromCounts]] over a shared counts column when
    * also selecting the components (see its codegen note). */
  def fleschReadingEase(text: Column): Column =
    fleschFromCounts(fleschCounts(text))
}
