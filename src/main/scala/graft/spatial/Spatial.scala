package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial point-in-polygon join (SURVEY.md §2 J7) — the reference
  * assigns each provider point to an MSOA polygon via `sp::over`
  * (`1c. Look for provider locations.R:445-454`).
  *
  * Design for Spark: polygons are a broadcast dimension (thousands of
  * rows vs millions/billions of points), each as a vertex array
  * `array<struct<x:double,y:double>>`. The join is a two-stage
  * predicate, all codegen'd HOFs — no UDF:
  *   1. bounding-box prefilter (cheap comparisons against precomputed
  *      min/max columns);
  *   2. exact even-odd ray casting via `aggregate` over the edge list.
  * At larger polygon counts the same predicate nests under a grid-cell
  * equi-join (bucketize bbox cells, join on cell id) — the standard
  * way to avoid broadcast-cross growth; the predicate itself is
  * unchanged.
  */
object Spatial {

  /** Vertex-array column from x/y coordinate arrays. */
  def polygon(xs: Column, ys: Column): Column =
    zip_with(xs, ys, (x, y) => struct(x.as("x"), y.as("y")))

  /** S7 — WKT fixture loading (`1c.:435-437` reads a shapefile; our
    * fixtures ship as WKT per FIXTURES.md §9): parse a simple
    * `POLYGON ((x y, x y, ...))` exterior ring into the vertex-array
    * form (pure expressions: split + transform + cast; CRS transforms
    * happen at fixture-prep time, SURVEY §7.4-6). */
  def polygonFromWkt(wkt: Column): Column = {
    val inner = regexp_extract(wkt, """POLYGON\s*\(\(([^)]*)\)\)""", 1)
    val pairs = split(inner, """\s*,\s*""")
    transform(pairs, p => {
      val xy = split(trim(p), """\s+""")
      struct(element_at(xy, 1).cast("double").as("x"),
        element_at(xy, 2).cast("double").as("y"))
    })
  }

  def bboxMinX(poly: Column): Column = array_min(transform(poly, _.getField("x")))
  def bboxMaxX(poly: Column): Column = array_max(transform(poly, _.getField("x")))
  def bboxMinY(poly: Column): Column = array_min(transform(poly, _.getField("y")))
  def bboxMaxY(poly: Column): Column = array_max(transform(poly, _.getField("y")))

  /** Even-odd ray casting: count crossings of a horizontal ray from
    * (px,py) to +inf against each polygon edge (v[i], v[i+1]); odd =
    * inside. Boundary convention matches the classic algorithm
    * (half-open edge intervals); vertices need not repeat the first
    * point. Pure expression — codegen'd, broadcast-join friendly. */
  def containsPoint(poly: Column, px: Column, py: Column): Column = {
    val n = size(poly)
    val crossings = aggregate(
      sequence(lit(1), n),
      lit(0),
      (acc, i) => {
        val a = element_at(poly, i)
        val b = element_at(poly, when(i === n, lit(1)).otherwise(i + 1))
        val ax = a.getField("x"); val ay = a.getField("y")
        val bx = b.getField("x"); val by = b.getField("y")
        val straddles = (ay > py) =!= (by > py)
        val xCross = ax + (py - ay) / (by - ay) * (bx - ax)
        acc + when(straddles && px < xCross, 1).otherwise(0)
      })
    crossings % 2 === 1
  }

  /** Point-in-polygon join: every point row paired with the polygon(s)
    * containing it (inner by default; "left" keeps unmatched points
    * with null polygon attrs — the reference's unmatched-provider
    * path). Polygon side is broadcast. */
  def pointInPolygonJoin(points: DataFrame, polygons: DataFrame,
      pxCol: String, pyCol: String, polyCol: String,
      joinType: String = "inner"): DataFrame = {
    val p = polygons
      .withColumn("__minx", bboxMinX(col(polyCol)))
      .withColumn("__maxx", bboxMaxX(col(polyCol)))
      .withColumn("__miny", bboxMinY(col(polyCol)))
      .withColumn("__maxy", bboxMaxY(col(polyCol)))
    val cond =
      col(pxCol) >= col("__minx") && col(pxCol) <= col("__maxx") &&
        col(pyCol) >= col("__miny") && col(pyCol) <= col("__maxy") &&
        containsPoint(col(polyCol), col(pxCol), col(pyCol))
    points.join(broadcast(p), cond, joinType)
      .drop("__minx", "__maxx", "__miny", "__maxy")
  }
}
