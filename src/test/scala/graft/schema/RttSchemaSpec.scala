package graft.schema

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RttSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bandColumns: ordered by week number, both naming shapes") {
    val df = Seq((1, 2L, 3L, 4L)).toDF(
      "Provider.Org.Code", "Gt.104.Weeks.SUM.1", "Gt.00.To.01.Weeks.SUM.1",
      "Gt.02.To.03.Weeks.SUM.1")
    assert(RttSchema.bandColumns(df) == Seq(
      "Gt.00.To.01.Weeks.SUM.1", "Gt.02.To.03.Weeks.SUM.1", "Gt.104.Weeks.SUM.1"))
  }

  test("normalizeWeeks packs bands into an array, preserving nulls") {
    val df = Seq(("P1", Some(5L), None: Option[Long], Some(7L))).toDF(
      "code", "Gt.00.To.01.Weeks.SUM.1", "Gt.01.To.02.Weeks.SUM.1",
      "Gt.02.To.03.Weeks.SUM.1")
    val norm = RttSchema.normalizeWeeks(df)
    assert(norm.columns.toSeq == Seq("code", "weeks"))
    val w = norm.head.getSeq[Any](1)
    assert(w(0) == 5L && w(1) == null && w(2) == 7L)
  }

  test("liveBandCount + pruneDeadBands: era drift (trailing all-null bands)") {
    // month where bands 3+ never filled (pre-2021 era shape)
    val df = Seq(("a", Some(1L), Some(2L)), ("b", Some(3L), None))
      .toDF("code", "b1", "b2")
      .withColumn("weeks", array(col("b1"), col("b2"),
        lit(null).cast("bigint"), lit(null).cast("bigint")))
      .select("code", "weeks")
    assert(RttSchema.liveBandCount(df) == 2)
    val pruned = RttSchema.pruneDeadBands(df)
    assert(pruned.select(max(size(col("weeks")))).head.getInt(0) == 2)
  }
}
