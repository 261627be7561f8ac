package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ContrastClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // positive class (label 1): docs 1,2 — 6 tokens total
  //   the=3, cat=2, sat=1
  // negative class (label 0): docs 3,4 — 4 tokens total
  //   le=2, chat=1, the=1
  private def labeled = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat", 1),
      (2L, "the the cat", 1),
      (3L, "le chat le", 0),
      (4L, "the", 0)).toDF("doc_id", "text", "lab")
  }

  test("weights are hand-computed integer ppm contrasts") {
    val m = TextFunctions.contrastModelTrain(labeled, "text", "lab")
      .collect().map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("pc"), r.getAs[Long]("nc"),
          r.getAs[Long]("weight")))).toMap
    // pm=6, nm=4
    // the: pc=3, nc=1 -> 3000000/6 - 1000000/4 = 500000 - 250000
    assert(m("the") == ((3L, 1L, 250000L)))
    // cat: 2000000 div 6 = 333333
    assert(m("cat") == ((2L, 0L, 333333L)))
    // sat: 1000000 div 6 = 166666
    assert(m("sat") == ((1L, 0L, 166666L)))
    // le: -(2000000 div 4)
    assert(m("le") == ((0L, 2L, -500000L)))
    assert(m("chat") == ((0L, 1L, -250000L)))
  }

  test("vocab cap keeps the top tokens by count with token tie-break") {
    val m2 = TextFunctions.contrastModelTrain(labeled, "text", "lab",
      vocabSize = 2)
    // counts: the=4, cat=2, le=2, chat=1, sat=1 -> cap 2 keeps the,cat
    // (cat < le on the token tie-break)
    assert(m2.select("token").collect().map(_.getString(0)).toSet ==
      Set("the", "cat"))
    // masses are over ALL tokens: weights of kept tokens are unchanged
    val w = m2.collect().map(r =>
      r.getAs[String]("token") -> r.getAs[Long]("weight")).toMap
    assert(w == Map("the" -> 250000L, "cat" -> 333333L))
  }

  test("scoring separates the classes; unseen tokens contribute zero") {
    val model = TextFunctions.contrastModelTrain(labeled, "text", "lab")
    import spark.implicits._
    val docs = Seq(
      (10L, "the cat"),          // 250000 + 333333 > 0
      (11L, "le chat"),          // -750000 < 0
      (12L, "unseen tokens only"), // all OOV -> score 0, pred 0
      (13L, "   ")               // no tokens at all
    ).toDF("doc_id", "text")
    val out = TextFunctions
      .contrastClassifierScore(docs, "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("score"),
          r.getAs[Int]("pred")))).toMap
    assert(out(10L) == ((2L, 583333L, 1)))
    assert(out(11L) == ((2L, -750000L, 0)))
    assert(out(12L) == ((3L, 0L, 0)))
    assert(out(13L) == ((0L, 0L, 0)))
  }

  test("the q_t_classifier gate shape separates its training classes") {
    // the synthetic corpus shares ONE 31-token vocabulary across all
    // langs (lang is metadata, not a text property), so perfect
    // separation is impossible by construction — the trained contrast
    // still has to score its own positive class strictly higher in
    // both the mean score and the pred rate (the Rocchio training-set
    // property), which is what this asserts.
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val model = TextFunctions.contrastModelTrain(
      docs.withColumn("__lab", (col("lang") === "en").cast("int")),
      "text", "__lab", vocabSize = 200)
    val scored = TextFunctions
      .contrastClassifierScore(docs, "doc_id", "text", model)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val agg = scored.groupBy((col("lang") === "en").as("is_en"))
      .agg(avg(col("pred")).as("rate"), avg(col("score")).as("mean"))
      .collect().map(r => r.getBoolean(0) ->
        ((r.getAs[Double]("rate"), r.getAs[Double]("mean")))).toMap
    assert(agg(true)._1 > agg(false)._1,
      s"en pred rate ${agg(true)._1} <= non-en ${agg(false)._1}")
    assert(agg(true)._2 > agg(false)._2,
      s"en mean score ${agg(true)._2} <= non-en ${agg(false)._2}")
  }
}
