package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class ChunkTextExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Reference implementation of the greedy cut, for oracle-style
    * equality on arbitrary fixture text. */
  private def refChunks(s: String, m: Int): Seq[String] = {
    def isWs(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < s.length) {
      val rem = s.length - pos
      val cLen =
        if (rem <= m) rem
        else {
          val win = s.substring(pos, pos + m)
          val i = win.lastIndexWhere(isWs)
          if (i >= 0) i + 1 else m
        }
      out += s.substring(pos, pos + cLen)
      pos += cLen
    }
    out.toSeq
  }

  test("hand-computed cuts: whitespace break, hard cut, short text, empty") {
    import spark.implicits._
    val rows = Seq(
      "alpha beta gamma",        // breaks after spaces
      "abcdefghijklmnop",        // no whitespace: hard cuts
      "ab cd",                   // shorter than window: single chunk
      "a         b",             // run of spaces: break at LAST ws
      "",                        // empty: zero chunks
      "ab\ncd ef\tgh")           // mixed whitespace kinds
    val m = 6
    val got = rows.toDF("text")
      .select(col("text"), ChunkTextExpr.chunkText(spark, col("text"), m).as("ch"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    rows.foreach { s =>
      assert(got(s) == refChunks(s, m), s"text='$s'")
    }
    assert(got("") == Seq.empty)
    assert(got("abcdefghijklmnop") == Seq("abcdef", "ghijkl", "mnop"))
  }

  test("fixture invariants: concat == text, len <= max, non-final ends ws or hard") {
    val m = 80
    val rows = Tables.documents(spark, sf)
      .select(col("text"), ChunkTextExpr.chunkText(spark, col("text"), m).as("ch"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = r.getString(0)
      val ch = r.getSeq[String](1)
      assert(ch.mkString("") == text, "concat(chunks) != text")
      ch.foreach(c => assert(c.nonEmpty && c.length <= m))
      ch.dropRight(1).foreach { c =>
        assert(c.length == m || " \t\n\r".contains(c.last),
          s"non-final chunk neither hard-cut nor whitespace-ended: '${c.takeRight(5)}'")
      }
      assert(ch == refChunks(text, m))
    }
  }

  test("property: invariants hold on random whitespace-heavy strings") {
    // fixed-seed manual sampling (scalacheck runner isn't on the
    // offline classpath — same convention as HashKernelPropertySpec)
    val rng = new scala.util.Random(1234)
    val ws = " \t\n\r"
    def randomText(): String = {
      val n = rng.nextInt(400)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        if (rng.nextInt(4) == 0) sb.append(ws(rng.nextInt(ws.length)))
        else sb.append(('a' + rng.nextInt(26)).toChar)
      }
      sb.toString
    }
    val expr = ChunkTextExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), maxChars = 1)
    (0 until 500).foreach { _ =>
      val m = 1 + rng.nextInt(50)
      val s = randomText()
      val got = ChunkTextExpr(
        org.apache.spark.sql.catalyst.expressions.Literal(s), m)
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .array.map(_.toString)
      assert(got.mkString("") == s, s"m=$m text='$s'")
      got.foreach(c => assert(c.nonEmpty && c.length <= m))
      got.dropRight(1).foreach(c =>
        assert(c.length == m || ws.contains(c.last)))
      assert(got.toSeq == refChunks(s, m), s"m=$m text='$s'")
    }
    // degenerate window: maxChars=1 must emit one chunk per char
    val one = expr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab c"))
      .array.map(_.toString)
    assert(one.toSeq == Seq("a", "b", " ", "c"))
  }

  test("whole-stage codegen path == interpreted eval") {
    // same pattern as the other kernels: force both paths and compare
    val df = Tables.documents(spark, sf).select(col("text"))
    val withCodegen = df
      .select(ChunkTextExpr.chunkText(spark, col("text"), 64).as("ch"))
      .collect().map(_.getSeq[String](0).toList).toList
    val sess = spark.newSession()
    sess.conf.set("spark.sql.codegen.wholeStage", "false")
    sess.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = sess.read.parquet(s"$sf/documents.parquet")
      .select(ChunkTextExpr.chunkText(sess, col("text"), 64).as("ch"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(withCodegen == interpreted)
  }
}
