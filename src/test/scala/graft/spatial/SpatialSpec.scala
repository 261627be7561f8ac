package graft.spatial

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SpatialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // concave "L" polygon: unit tests must catch ray-casting subtleties
  // a bbox or convex test would miss
  private val lShape = (Seq(0.0, 4.0, 4.0, 2.0, 2.0, 0.0),
    Seq(0.0, 0.0, 2.0, 2.0, 4.0, 4.0))

  private def contains(xs: Seq[Double], ys: Seq[Double],
      px: Double, py: Double): Boolean =
    Seq((xs, ys, px, py)).toDF("xs", "ys", "px", "py")
      .select(Spatial.containsPoint(
        Spatial.polygon(col("xs"), col("ys")), col("px"), col("py")))
      .head.getBoolean(0)

  test("ray casting on a concave polygon") {
    val (xs, ys) = lShape
    assert(contains(xs, ys, 1.0, 1.0))   // lower arm
    assert(contains(xs, ys, 1.0, 3.0))   // upper arm
    assert(contains(xs, ys, 3.0, 1.0))   // right of lower arm
    assert(!contains(xs, ys, 3.0, 3.0))  // the notch — inside bbox, outside poly
    assert(!contains(xs, ys, 5.0, 1.0))  // fully outside
    assert(!contains(xs, ys, -1.0, 1.0))
  }

  test("WKT polygon parsing matches the array form") {
    val df = Seq("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4))").toDF("wkt")
      .select(Spatial.polygonFromWkt($"wkt").as("poly"))
    val verts = df.head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(verts == Seq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0),
      (2.0, 4.0), (0.0, 4.0)))
    // parsed polygon drives the same ray cast
    val inside = df.select(
      Spatial.containsPoint($"poly", lit(1.0), lit(1.0)).as("a"),
      Spatial.containsPoint($"poly", lit(3.0), lit(3.0)).as("b")).head
    assert(inside.getBoolean(0) && !inside.getBoolean(1))
  }

  test("point-in-polygon join assigns points to overlapping polygons") {
    val polys = Seq(
      ("A", Seq(0.0, 2.0, 2.0, 0.0), Seq(0.0, 0.0, 2.0, 2.0)),
      ("B", Seq(1.0, 3.0, 3.0, 1.0), Seq(1.0, 1.0, 3.0, 3.0)))
      .toDF("poly_id", "xs", "ys")
      .select($"poly_id", Spatial.polygon($"xs", $"ys").as("poly"))
    val pts = Seq((1, 0.5, 0.5), (2, 1.5, 1.5), (3, 2.5, 2.5), (4, 9.0, 9.0))
      .toDF("pid", "px", "py")
    val joined = Spatial.pointInPolygonJoin(pts, polys, "px", "py", "poly")
      .select("pid", "poly_id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(joined == Set((1, "A"), (2, "A"), (2, "B"), (3, "B")))
    // left join keeps the unmatched point
    val left = Spatial.pointInPolygonJoin(pts, polys, "px", "py", "poly", "left")
    assert(left.filter($"pid" === 4 && $"poly_id".isNull).count() == 1)
  }
}
