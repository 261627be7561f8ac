package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hand-computed fixtures for the corpus-hygiene operators: PII
  * redaction and C4-style line cleaning with corpus-level line dedup.
  * (The driver gate checks both against DuckDB on the fixture corpus;
  * these pin the SEMANTICS on cases the word-salad corpus can't
  * contain organically.) */
class TextHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("redactPii: emails, IPs, phones; placeholders don't cascade") {
    import spark.implicits._
    val got = Seq(
      "mail a.b+c@ex-1.co.uk end",
      "host 192.168.0.1 and 10.0.0.7",
      "call +44 20 7946 0958 now",
      "digits 12345 stay, version 1.2 stays",
      "combo x@y.org at 1.2.3.4 tel +1 555 0100")
      .toDF("t").select(TextFunctions.redactPii(col("t")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got(0) == "mail <EMAIL> end")
    assert(got(1) == "host <IP> and <IP>")
    assert(got(2) == "call <PHONE> now")
    // short digit runs and dotted versions are NOT PII
    assert(got(3) == "digits 12345 stay, version 1.2 stays")
    assert(got(4) == "combo <EMAIL> at <IP> tel <PHONE>")
  }

  test("lineCleanDedup: word-count filter, ban list, first-occurrence dedup, order") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma\nshared boilerplate line\nsolo"),
      (2L, "delta epsilon words\nshared boilerplate line\nlorem ipsum junk here"),
      (3L, "shared boilerplate line"))
      .toDF("doc_id", "text")
    val got = TextFunctions.lineCleanDedup(df, "doc_id", "text",
        minWords = 2, banned = Seq("lorem ipsum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // doc 1: keeps its own line + first sighting of the boilerplate;
    // "solo" fails the 2-word floor
    assert(got(1L) == (2L, "alpha beta gamma\nshared boilerplate line"))
    // doc 2: boilerplate deduped away (doc 1 owns it), lorem banned
    assert(got(2L) == (1L, "delta epsilon words"))
    // doc 3: nothing survives -> empty row, not a missing row
    assert(got(3L) == (0L, ""))
  }

  test("native stopword kernel == HOF forms (languageId, stopwordRatio, qualityScore)") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .union(Seq((9001L, ""), (9002L, "  "), (9003L, "der der die und zzz"),
        (9004L, "le la les mixed the and of to a in is that it was"))
        .toDF("doc_id", "text"))
    val cmp = docs.select(col("doc_id"),
        TextFunctions.languageId(col("text")).as("hof_lang"),
        TextFunctions.languageId(spark, col("text")).as("nat_lang"),
        TextFunctions.stopwordRatio(col("text")).as("hof_ratio"),
        TextFunctions.stopwordRatio(spark, col("text"), "en").as("nat_ratio"),
        TextFunctions.qualityScore(col("text")).as("hof_q"),
        TextFunctions.qualityScore(spark, col("text")).as("nat_q"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach { r =>
      assert(r.getString(1) == r.getString(2), s"lang mismatch doc ${r.getLong(0)}")
      assert(r.getDouble(3) == r.getDouble(4), s"ratio mismatch doc ${r.getLong(0)}")
      assert(r.getDouble(5) == r.getDouble(6), s"quality mismatch doc ${r.getLong(0)}")
    }
  }

  test("vocabulary: deterministic count-then-token order; oovStats edge cases") {
    import spark.implicits._
    val df = Seq((1L, "b b a a c"), (2L, "a d"), (3L, ""))
      .toDF("doc_id", "text")
    // counts: a=3, b=2, c=1, d=1 -> top-3 = a, b, c (tie c<d broken by token)
    val vocab = TextFunctions.vocabulary(df, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(vocab == Seq(("a", 3L, 1L), ("b", 2L, 2L), ("c", 1L, 3L)))
    val oov = TextFunctions.oovStats(df, "doc_id", "text", vocabSize = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(oov(1L) == (5L, 0L, 0L))         // all in vocab
    assert(oov(2L) == (2L, 1L, 5000L))      // "d" is OOV -> 1/2 = 5000bp
    assert(oov(3L) == (0L, 0L, 0L))         // empty doc: no div-by-zero
  }

  test("tfIdfTopTerms: hand-computed scores, tie order, majority-token drop") {
    import spark.implicits._
    val df = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "durian durian durian")).toDF("doc_id", "text")
    // N=3; df: apple 1, banana 2, cherry 1, durian 1
    // idf_x1000: apple/cherry/durian 3000, banana 1500
    val top = TextFunctions.tfIdfTopTerms(df, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(5), r.getLong(6))).toMap
    assert(top((1L, 1L)) == ("apple", 3000L, 6000L))
    assert(top((1L, 2L)) == ("banana", 1500L, 1500L))
    assert(top((2L, 1L)) == ("cherry", 3000L, 3000L))
    assert(top((2L, 2L)) == ("banana", 1500L, 1500L))
    assert(top((3L, 1L)) == ("durian", 3000L, 9000L))
    assert(top.size == 5)
    // dropMajorityTokens: banana appears in 2/3 docs > N/2 -> dropped
    val dropped = TextFunctions
      .tfIdfTopTerms(df, "doc_id", "text", k = 2, dropMajorityTokens = true)
      .select("token").collect().map(_.getString(0)).toSet
    assert(!dropped.contains("banana") && dropped == Set("apple", "cherry", "durian"))
  }

  test("gopherQualityStats: hand-computed rules and flags") {
    import spark.implicits._
    val docs = Seq(
      // 1: clean doc passing everything (21 words incl 2 stopwords,
      //    mean len in range, alphabetic, no symbols)
      (1L, ("the cat and dog ran over green hills toward distant " +
            "rivers while birds sang quiet songs above them all " +
            "every single day")),
      // 2: too few words
      (2L, "the and tiny"),
      // 3: symbol flood
      (3L, ("the cat and dog ran over green hills toward distant " +
            "rivers while birds sang quiet songs ### ... ### ...")),
      // 4: numerals only -> alpha rule + stopword rule fail
      (4L, (1 to 25).map(i => (i * 111).toString).mkString(" "))
    ).toDF("doc_id", "text")
    val got = TextFunctions.gopherQualityStats(docs, "doc_id", "text",
        minWords = 20)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    val d1 = got(1L)
    assert(d1.getAs[Long]("n_words") == 22L)
    assert(d1.getAs[Long]("stop_kinds") >= 2L)
    assert(d1.getAs[Long]("gopher_pass") == 1L, d1.toString)

    assert(got(2L).getAs[Long]("f_words") == 0L)
    assert(got(2L).getAs[Long]("gopher_pass") == 0L)

    val d3 = got(3L)
    // 6 '#' chars + 2 '...' runs = 8 symbols over 22 words -> 3636 bp
    assert(d3.getAs[Long]("n_symbols") == 8L, d3.toString)
    assert(d3.getAs[Long]("f_symbol") == 0L)

    val d4 = got(4L)
    assert(d4.getAs[Long]("alpha_words") == 0L)
    assert(d4.getAs[Long]("f_alpha") == 0L)
    assert(d4.getAs[Long]("f_stop") == 0L)
  }

  test("encodeTokens: hand-computed ranks, OOV id, order preservation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b a b c b a"),   // counts: b=4(with doc2), a=3, c=1
      (2L, "a b zz")         // zz is rank-4 in a k=3 vocab? no: k=3 keeps b,a,c
    ).toDF("doc_id", "text")
    // corpus counts: b=4, a=3, c=1, zz=1 -> ranks b=1, a=2, c=3 (k=3;
    // ties cnt=1 broken token ASC: c before zz, zz falls out -> OOV)
    val vocab = TextFunctions.vocabulary(docs, "text", 3)
    val got = TextFunctions.encodeTokens(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Seq[Long]]("ids"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_oov")))).toMap
    assert(got(1L) == ((Seq(1L, 2L, 1L, 3L, 1L, 2L), 6L, 0L)))
    assert(got(2L) == ((Seq(2L, 1L, 0L), 3L, 1L)))
  }
}
