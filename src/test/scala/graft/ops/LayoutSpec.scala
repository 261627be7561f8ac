package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[Layout]]: the Morton interleave against a from-scratch reference
  * (fixed-seed sampling — scalacheck's runner isn't on the offline
  * classpath), and the clustered write's physical payoff (tight
  * per-file min/max envelopes on every participating dimension). */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference interleave: bit i of column j -> curve bit i*k + j. */
  private def mortonRef(vals: Seq[Long], bits: Int): Long =
    vals.zipWithIndex.foldLeft(0L) { case (acc, (v, j)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        a | (((v >> i) & 1L) << (i * vals.size + j))
      }
    }

  test("zorderValue equals the reference interleave (2 and 3 columns)") {
    val rng = new scala.util.Random(1234)
    val triples = Seq.fill(200)(
      (rng.nextInt(256).toLong, rng.nextInt(256).toLong,
        rng.nextInt(256).toLong))
    val df = triples.toDF("x", "y", "z")
    val got2 = df.select(
        Layout.zorderValue(Seq(col("x"), col("y")), 8)).as[Long]
      .collect().toSeq
    assert(got2 == triples.map(t => mortonRef(Seq(t._1, t._2), 8)))
    val got3 = df.select(
        Layout.zorderValue(Seq(col("x"), col("y"), col("z")), 8)).as[Long]
      .collect().toSeq
    assert(got3 == triples.map(t => mortonRef(Seq(t._1, t._2, t._3), 8)))
  }

  test("zorderValue locality: adjacent cells differ less than distant ones") {
    // the whole point of the curve: near in space -> near on the curve
    // (on average). Sample cell pairs at L1 distance 1 vs distance 64.
    val rng = new scala.util.Random(99)
    def z(x: Long, y: Long) = mortonRef(Seq(x, y), 8)
    val near = Seq.fill(300) {
      val (x, y) = (rng.nextInt(255).toLong, rng.nextInt(255).toLong)
      math.abs(z(x, y) - z(x + 1, y))
    }
    val far = Seq.fill(300) {
      val (x, y) = (rng.nextInt(191).toLong, rng.nextInt(191).toLong)
      math.abs(z(x, y) - z(x + 64, y))
    }
    assert(near.sum < far.sum / 10,
      s"curve distance for adjacent cells (${near.sum}) should be far " +
        s"below distant cells (${far.sum})")
  }

  test("zorderValue rejects invalid widths") {
    intercept[IllegalArgumentException] {
      Layout.zorderValue(Seq(col("x"), col("y")), 32)
    }
    intercept[IllegalArgumentException] { Layout.zorderValue(Seq.empty, 8) }
  }

  test("clusteredWrite: content-invariant, and per-file envelopes are " +
      "tight on BOTH dimensions") {
    val dir = graft.util.TempDirs.scoped("layout-spec").resolve("t").toString
    val rows = (0 until 4096).map { i =>
      ((i * 2654435761L) % 256, (i * 40503L) % 256, i.toLong)
    }
    val df = rows.toDF("zx", "zy", "payload")
    Layout.clusteredWrite(df, dir,
      Layout.zorderValue(Seq(col("zx"), col("zy")), 8), numFiles = 16)
    val back = spark.read.parquet(dir)
    // content invariance (the helper column must not leak)
    assert(back.columns.sorted.toSeq == Seq("payload", "zx", "zy"))
    assert(back.select(sum("payload")).as[Long].head == rows.map(_._3).sum)
    assert(back.count() == 4096)
    // physical payoff: a z-clustered 8-bit grid cut into 16 range
    // files keeps each file's zx/zy spread a fraction of the global
    // 0..255; an unclustered write would leave ~full-range envelopes.
    // A z-range of 65536/16 = 4096 curve points spans at most a
    // handful of 64x64 cells -> spreads well under the full range.
    val spreads = back
      .groupBy(input_file_name().as("f"))
      .agg((max("zx") - min("zx")).as("sx"), (max("zy") - min("zy")).as("sy"))
      .agg(avg("sx"), avg("sy")).as[(Double, Double)].head
    assert(spreads._1 < 140, s"mean zx file-spread ${spreads._1} not tight")
    assert(spreads._2 < 140, s"mean zy file-spread ${spreads._2} not tight")
    // the pushdown contract the clustering exists to feed: both range
    // predicates must reach the parquet scan as PushedFilters. Matched
    // loosely (column names inside the PushedFilters list) — the exact
    // rendering of filter literals is a Spark formatting detail, and a
    // gate result must never depend on it (it used to: q_layout_zorder
    // carried the explain-string match as a result column).
    val planStr = back
      .filter(col("zx").between(16, 47) && col("zy").between(64, 95))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushedSection = planStr.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushedSection.contains("zx") && pushedSection.contains("zy"),
      s"range predicates not pushed to the scan:\n$pushedSection")
  }
}
