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
    * SCALE SHAPE of the merge loop: the corpus scan
    * ([[wordTable]]) is the only corpus-sized leg. The loop itself
    * runs over the distinct-word frequency table — vocabulary-sized
    * BY CONSTRUCTION (natural-language vocabularies are millions of
    * words at most, regardless of corpus bytes) — so when that table
    * fits under `localVocabLimit` rows it is collected ONCE and the
    * greedy loop runs in driver code: at a production 30k-merge
    * vocabulary that is 30k in-memory passes instead of ~30k cluster
    * jobs (shuffle + argmax collect each — hours of pure scheduler
    * overhead over a table a single machine holds comfortably). The
    * distributed loop remains the fallback for a vocabulary above the
    * bound (or `localVocabLimit = 0` to force it); both induce
    * IDENTICAL merges — same every-adjacent-occurrence counting, same
    * (count DESC, pair ASC by UTF-8 bytes) tie-break, same greedy
    * left-to-right non-overlapping application (spec-asserted
    * local == distributed).
    *
    * `materializeEvery` (distributed loop only): each round stacks one
    * `replace` projection on the word table, so round r's count job
    * would re-run r-1 replaces — every `materializeEvery` rounds the
    * merged table is localCheckpoint'ed, resetting the chain. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 1L, materializeEvery: Int = 50,
      localVocabLimit: Long = 2000000L): DataFrame = {
    require(numMerges >= 1, "numMerges must be positive")
    require(materializeEvery >= 1, "materializeEvery must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // vocabulary-sized; every round scans it, so cache the base — the
    // per-round `s` updates stack thin projections on top until the
    // next materialization point
    val base = wordTable(df, textCol).cache()
    val vocabN = base.count()
    val merges =
      if (vocabN <= localVocabLimit)
        trainLocal(base.select(col("cnt"), col("s")).collect()
            .map(r => (r.getLong(0), r.getString(1))),
          numMerges, minPairCount)
      else trainDistributed(base, numMerges, minPairCount, materializeEvery)
    base.unpersist()
    merges.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  private def trainDistributed(base: DataFrame, numMerges: Int,
      minPairCount: Long,
      materializeEvery: Int): Seq[(Long, String, String, Long)] = {
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
    merges.toSeq
  }

  /** Spark's string ordering compares UTF8String BYTES (so does
    * DuckDB); Java String.compareTo compares UTF-16 code units, which
    * diverges above the BMP — the local tie-break must match the
    * engines', not the JVM's. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Literal left-to-right non-overlapping replace (scan resumes
    * AFTER each replacement) — exactly `String.replace` / Spark
    * `replace` semantics, without re-compiling a literal regex per
    * word per round. */
  private def replaceLiteral(s: String, target: String,
      repl: String): String = {
    var from = s.indexOf(target)
    if (from < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (from >= 0) {
      sb.append(s, last, from).append(repl)
      last = from + target.length
      from = s.indexOf(target, last)
    }
    sb.append(s, last, s.length).toString
  }

  /** The greedy merge loop over a COLLECTED `(cnt, s)` word table —
    * identical induction to [[trainDistributed]] (spec-asserted):
    * every adjacent occurrence counts ("aaa" contributes (a,a)
    * twice), ties break (count DESC, pair ASC under UTF-8 byte
    * order), application is the same separator-wrapped replace. */
  private def trainLocal(words0: Array[(Long, String)], numMerges: Int,
      minPairCount: Long): Seq[(Long, String, String, Long)] = {
    val cnts = words0.map(_._1)
    val ss = words0.map(_._2)
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (r <- 1 to numMerges if !exhausted) {
      val pairCnt = scala.collection.mutable.HashMap.empty[String, Long]
      var wi = 0
      while (wi < ss.length) {
        val syms = ss(wi).substring(1, ss(wi).length - 1).split(Sep2, -1)
        val c = cnts(wi)
        var i = 0
        while (i < syms.length - 1) {
          // single-sep joined, the pairsOf unit (and the tie-break key)
          val k = syms(i) + Sep + syms(i + 1)
          pairCnt.update(k, pairCnt.getOrElse(k, 0L) + c)
          i += 1
        }
        wi += 1
      }
      var bestPair: String = null
      var bestCnt = Long.MinValue
      pairCnt.foreach { case (k, c) =>
        if (c > bestCnt || (c == bestCnt && utf8Lt(k, bestPair))) {
          bestPair = k; bestCnt = c
        }
      }
      if (bestPair == null || bestCnt < minPairCount) exhausted = true
      else {
        val Array(l, rr) = bestPair.split(Sep, 2)
        merges += ((r.toLong, l, rr, bestCnt))
        val target = Sep + l + Sep2 + rr + Sep
        val repl = Sep + l + rr + Sep
        var i = 0
        while (i < ss.length) {
          ss(i) = replaceLiteral(ss(i), target, repl)
          i += 1
        }
      }
    }
    merges.toSeq
  }

  /** APPLY a trained merge list through the NATIVE kernel
    * ([[graft.plans.BpeSegmentExpr]]): one codegen'd expression whose
    * plan size is independent of the vocabulary, vs [[segment]]'s one
    * nested `transform` per merge (a ~30k-deep Catalyst tree at a
    * production vocabulary — analyzer stack overflow or codegen
    * collapse). Identical output schema and bit-identical symbols
    * (spec-asserted merge-for-merge against [[segment]]); `segment`
    * remains as the small-vocab oracle twin. */
  def segmentFast(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    df.withColumn("bpe_symbols",
        graft.plans.BpeSegmentExpr.bpeSegment(df.sparkSession,
          col(textCol), merges))
      .withColumn("n_symbols", size(col("bpe_symbols")).cast("long"))

  /** APPLY a trained merge list: segment each word of `textCol` into
    * its BPE symbols (rank-ordered replaces over the wrapped string —
    * each merge is one codegen'd `replace`, chained in-plan; no UDF,
    * no driver loop over rows). Returns the input plus
    * `bpe_symbols array<string>` (all words' symbols, in order) and
    * `n_symbols`. Plan depth grows with the merge COUNT — fine for
    * demo vocabularies and as [[segmentFast]]'s oracle twin; use
    * [[segmentFast]] for production merge lists. */
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
