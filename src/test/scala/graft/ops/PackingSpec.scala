package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.functions.TextFunctions

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("greedy fold: hand-computed bins, oversized doc capped and alone") {
    import spark.implicits._
    val docs = Seq(
      (1L, 4L), (2L, 4L), (3L, 4L), (4L, 10L), (5L, 1L), (6L, 12L))
      .toDF("doc_id", "toks_in")
      .withColumn("src", lit("s"))
    val out = Packing.packSummary(Packing.packGreedy(
        docs, "src", "doc_id", col("toks_in"), budget = 10, shardSpan = 100))
      .select("bin", "n_docs", "fill_toks", "first_doc", "last_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    assert(out === List(
      (0L, 2L, 8L, 1L, 2L),   // 4+4; next 4 would overflow
      (1L, 1L, 4L, 3L, 3L),
      (2L, 1L, 10L, 4L, 4L),  // exact-budget doc alone
      (3L, 1L, 1L, 5L, 5L),
      (4L, 1L, 10L, 6L, 6L))) // 12 capped to budget, own bin
  }

  test("bins never cross a shard seam even when fill would fit") {
    import spark.implicits._
    val docs = Seq((99L, 1L), (101L, 1L)).toDF("doc_id", "toks_in")
      .withColumn("src", lit("s"))
    val out = Packing.packGreedy(docs, "src", "doc_id", col("toks_in"),
        budget = 10, shardSpan = 100)
      .select("shard", "doc_id", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // both docs open bin 0 of their OWN shard
    assert(out === Set((0L, 99L, 0L), (1L, 101L, 0L)))
  }

  test("corpus invariants: fill bounded by budget, greedy tightness") {
    val budget = 512L
    val asg = Packing.packGreedy(Tables.documents(spark, sf),
      "source", "doc_id", TextFunctions.tokenCount(col("text")),
      budget = budget, shardSpan = 200)
    val bins = Packing.packSummary(asg).collect()
    assert(bins.nonEmpty)
    bins.foreach { r =>
      assert(r.getAs[Long]("fill_toks") <= budget,
        s"bin over budget: $r")
    }
    // greedy tightness: within a (grp, shard), a bin's fill plus the
    // NEXT bin's first doc would overflow — otherwise the greedy fold
    // would have kept filling
    val rows = asg.orderBy("grp", "shard", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    rows.sliding(2).foreach {
      case Array((g1, s1, _, _, b1), (g2, s2, _, t2, b2))
          if g1 == g2 && s1 == s2 && b2 == b1 + 1 =>
        val fill = rows.filter(x => x._1 == g1 && x._2 == s1 && x._5 == b1)
          .map(_._4).sum
        assert(fill + t2 > budget,
          s"bin $b1 of ($g1,$s1) closed early: fill=$fill next=$t2")
      case _ => ()
    }
  }
}
