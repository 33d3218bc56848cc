package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, all
  * pure codegen'd column expressions (no UDFs): token counting, quality
  * scoring, language-ID heuristic, shingle fingerprinting. Designed to run
  * inside a single projection over the documents scan — one pass, no
  * shuffle, fully pushdown/pruning friendly at 100 TB.
  */
object TextOps {

  /** Whitespace token count (cheap, exact for single-space text). */
  def tokenCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, lit(" "), lit(""))) + 1)
      .cast("long")

  /** BPE-ish subword count: words plus punctuation/digit splits — the
    * standard pre-tokenizer regex family. Upper-bounds LLM token counts
    * far better than whitespace alone. */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"),
      c => length(c) > 0)).cast("long")

  /** Occurrences of a word surrounded by spaces (portable to SQL oracles:
    * pure length/replace arithmetic). */
  def wordOccurrences(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val needle = s" $word "
    // non-overlapping occurrences; replace shrinks by len(needle)-1 per hit
    // when replacing " w " with " " (keeps separators intact for adjacency)
    ((length(padded) - length(regexp_replace(padded, lit(needle), lit(" "))))
      / (needle.length - 1)).cast("long")
  }

  /** Heuristic quality score in [0,1]: penalizes very short/very long
    * docs, rewards normal word length and stopword presence. The exact
    * formula is arbitrary but deterministic and portable. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val meanWordLen = length(text).cast("double") / greatest(nTok, lit(1.0))
    val stopRatio = (wordOccurrences(text, "the") +
      wordOccurrences(text, "a")).cast("double") / greatest(nTok, lit(1.0))
    val lenScore = when(nTok < 5, nTok / 5.0)
      .when(nTok > 1000, lit(0.5)).otherwise(lit(1.0))
    val wordScore = when(meanWordLen.between(3.0, 9.0), lit(1.0))
      .otherwise(lit(0.6))
    val stopScore = least(stopRatio * 5.0, lit(1.0))
    round(lenScore * 0.4 + wordScore * 0.3 + stopScore * 0.3, 4)
  }

  /** n-gram language-ID: vote by language-distinctive stopwords. Returns
    * the argmax language code or 'und'. Real pipelines would use a model;
    * the Spark-side shape (single projection, no shuffle) is what matters
    * at scale. */
  def languageId(text: Column): Column = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "is"),
      "de" -> Seq("der", "und", "die", "ist"),
      "fr" -> Seq("le", "la", "et", "est"),
      "es" -> Seq("el", "los", "y", "es"),
      "zh" -> Seq("de", "shi", "zai", "he"))
    val scores = markers.map { case (lang, words) =>
      struct(words.map(w => wordOccurrences(text, w)).reduce(_ + _).as("n"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(best.getField("n") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Character k-shingle fingerprint: min and max of hashed k-grams —
    * a 2-sketch winnowing-style document fingerprint. Pure expression:
    * transform over a sequence of offsets, no explode. */
  def shingleFingerprint(text: Column, k: Int = 8): Column = {
    val n = greatest(length(text) - (k - 1), lit(1))
    val hashes = transform(sequence(lit(1), n),
      i => xxhash64(text.substr(i, lit(k))))
    struct(array_min(hashes).as("min_hash"), array_max(hashes).as("max_hash"))
  }
}
