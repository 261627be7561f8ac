package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BYTE-PAIR-ENCODING tokenizer TRAINING (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" —
  * public) — the vocabulary-induction step every LLM data pipeline
  * runs before encoding: iteratively merge the most frequent adjacent
  * symbol pair, starting from characters.
  *
  * REPRESENTATION: a word's symbol sequence is a SEPARATOR-WRAPPED
  * STRING — each symbol wrapped as `<sep>sym<sep>` (U+001F, never in
  * text tokens) and concatenated. This makes merge application a
  * plain `replace(s, <sep>L<sep><sep>R<sep>, <sep>LR<sep>)`, whose
  * left-to-right non-overlapping scan IS the greedy BPE merge
  * semantics ("aaa" + merge (a,a) -> [aa, a], never [a, aa]) — and
  * `replace` is engine-portable, so the whole training loop restates
  * in the DuckDB gate verbatim. Pair counting counts EVERY adjacent
  * occurrence ("aaa" contributes (a,a) twice), the reference
  * `get_stats` convention.
  *
  * SCALE SHAPE: the corpus is scanned ONCE (the word-frequency
  * count); every merge round then runs over the DISTINCT-WORD table —
  * vocabulary-sized, orders of magnitude under corpus size — as one
  * explode + one map-side-combined count shuffle plus a single-row
  * argmax collect, and merge application is a pure map. Driver state
  * is the merge list (numMerges pairs). Ties break (count DESC, pair
  * ASC) — byte-order string comparison, identical in both engines —
  * so the induced merge sequence is bit-reproducible.
  */
object Bpe {

  val Sep = "\u001f"
  private val Sep2 = Sep + Sep

  /** Distinct-word frequency table with the wrapped-character symbol
    * string: `(word, cnt, s)`. One corpus pass. */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.filter(length(trim(col(textCol))) > 0)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("s", wrapChars(col("word")))

  /** `word` -> `<sep>c1<sep><sep>c2<sep>...` (one wrapped symbol per
    * character). */
  private def wrapChars(word: Column): Column =
    concat(lit(Sep),
      array_join(transform(sequence(lit(1), length(word)),
        i => word.substr(i, lit(1))), Sep2),
      lit(Sep))

  private def symsOf(s: Column): Column =
    split(trim(s, Sep), Sep2)

  /** Adjacent symbol pairs of the wrapped string, single-sep joined
    * (`L<sep>R`) — the count/argmax unit. Empty for 1-symbol words. */
  private def pairsOf(s: Column): Column = {
    val syms = symsOf(s)
    when(size(syms) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(syms) - 1),
        i => concat(element_at(syms, i), lit(Sep),
          element_at(syms, i + 1))))
  }

  /** One merge as a `replace` over the wrapped string — the greedy
    * left-to-right application. */
  private def applyMerge(s: Column, l: String, r: String): Column =
    replace(s, lit(Sep + l + Sep2 + r + Sep), lit(Sep + l + r + Sep))

  /** Train `numMerges` merges over the corpus; returns
    * `(merge_rank, left_sym, right_sym, pair_count)`, rank 1-based in
    * induction order. Stops early (fewer rows) when no pair remains
    * with count >= `minPairCount`.
    *
    * `materializeEvery`: each round stacks one `replace` projection on
    * the word table, so round r's count job would re-run r-1 replaces
    * — harmless at demo merge counts, O(N^2) replace work at a real
    * 30k-merge vocabulary. Every `materializeEvery` rounds the merged
    * table is localCheckpoint'ed (vocabulary-sized — cheap), resetting
    * the chain; the induced merges are identical either way. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 1L, materializeEvery: Int = 50): DataFrame = {
    require(numMerges >= 1, "numMerges must be positive")
    require(materializeEvery >= 1, "materializeEvery must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // vocabulary-sized; every round scans it, so cache the base — the
    // per-round `s` updates stack thin projections on top until the
    // next materialization point
    val base = wordTable(df, textCol).cache()
    var words = base
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (r <- 1 to numMerges if !exhausted) {
      val top = words.select(col("cnt"), explode(pairsOf(col("s"))).as("pair"))
        .groupBy("pair").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("pair").asc)
        .limit(1).collect()
      top.headOption.filter(_.getLong(1) >= minPairCount) match {
        case None => exhausted = true
        case Some(row) =>
          val Array(l, rr) = row.getString(0).split(Sep, 2)
          merges += ((r.toLong, l, rr, row.getLong(1)))
          words = words.withColumn("s", applyMerge(col("s"), l, rr))
          if (r % materializeEvery == 0) words = words.localCheckpoint()
      }
    }
    base.unpersist()
    merges.toSeq.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  /** APPLY a trained merge list: segment each word of `textCol` into
    * its BPE symbols (rank-ordered replaces over the wrapped string —
    * each merge is one codegen'd `replace`, chained in-plan; no UDF,
    * no driver loop over rows). Returns the input plus
    * `bpe_symbols array<string>` (all words' symbols, in order) and
    * `n_symbols`. */
  def segment(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = when(length(trim(col(textCol))) === 0,
        array().cast("array<string>"))
      .otherwise(filter(split(trim(col(textCol)), "\\s+"), w => w =!= ""))
    val mergedS = merges.foldLeft(transform(words, w => wrapChars(w))) {
      (c, m) => transform(c, s => applyMerge(s, m._1, m._2))
    }
    df.withColumn("bpe_symbols",
        flatten(transform(mergedS, s => symsOf(s))))
      .withColumn("n_symbols", size(col("bpe_symbols")).cast("long"))
  }
}
