package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.similarity.Similarity

/** The centroid-table carrier contract: the literal-HOF path and the
  * expression-object path are BIT-IDENTICAL (exact int64 distances,
  * (distance, cell) total order — no summation-order drift is even
  * possible), the threshold routes between them, and the kernels pin
  * the tie/order/null edges the HOF encodes structurally. */
class CentroidExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val ConfKey = "spark.graft.ann.centroidLiteralMaxCoeffs"

  /** run `f` with the carrier path forced at any table size. */
  private def forcedCarrier[T](f: => T): T = {
    spark.conf.set(ConfKey, "0")
    try f finally spark.conf.unset(ConfKey)
  }

  private lazy val emb =
    graft.Tables.embeddings(spark, "/root/testdata/sf0.001").cache()

  test("kmeansFitInt8 assignments are identical literal vs carrier " +
      "(training loop + final assign both reroute)") {
    def run() = Similarity.kmeansFitInt8(emb, "vec_id", "embedding",
        k = 7, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val literal = run()
    val carrier = forcedCarrier(run())
    assert(literal == carrier)
    assert(literal.map(_._2).distinct.size > 1, "degenerate clustering")
  }

  test("the carrier actually rides the plan above the threshold " +
      "(and stays out of it below)") {
    def planOf() = Similarity.kmeansFitInt8(emb, "vec_id", "embedding",
      k = 3, iters = 1).queryExecution.analyzed.toString
    assert(!planOf().contains("graft_assign_cell"),
      "below the threshold the literal path must serve")
    assert(forcedCarrier(planOf()).contains("graft_assign_cell"),
      "above the threshold the carrier expression must serve")
  }

  test("ivfTopKQuantized (probe path) is identical literal vs carrier") {
    val qs = emb.filter(col("vec_id") < 8)
    def run() = Similarity.ivfTopKQuantized(qs, emb, "vec_id",
        "embedding", k = 5, nCells = 6, nProbe = 3, iters = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(run() == forcedCarrier(run()))
  }

  test("ivfPqTopK (residual path) is identical literal vs carrier") {
    val qs = emb.filter(col("vec_id") < 8)
    def run() = Similarity.ivfPqTopK(qs, emb, "vec_id", "embedding",
        k = 5, nCells = 6, nProbe = 3, itersCoarse = 2, m = 4, ks = 4,
        itersPq = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(run() == forcedCarrier(run()))
  }

  test("persistent IVF index built+served on the carrier path equals " +
      "the literal-path index") {
    val qs = emb.filter(col("vec_id") < 8)
    def run(tag: String) = {
      val path = graft.util.TempDirs.scoped(s"centroid-carrier-$tag").toString
      Similarity.ivfIndexBuild(emb, "vec_id", "embedding",
        nCells = 6, iters = 2, path = path)
      Similarity.ivfIndexTopK(qs, "vec_id", "embedding", k = 5,
          nProbe = 3, path = path)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sorted.toSeq
    }
    assert(run("lit") == forcedCarrier(run("car")))
  }

  test("pqTrain codebooks are identical literal vs carrier " +
      "(the per-subspace Lloyd literal reroutes too)") {
    def run() = Similarity.pqTrain(emb, "vec_id", "embedding",
        m = 4, ks = 4, iters = 2)
      .cents.toSeq.sortBy(_._1).map { case (k, v) => (k, v.toSeq) }
    assert(run() == forcedCarrier(run()))
  }

  test("subspaceAssign: argmin per subspace, ties to the lower cell") {
    import spark.implicits._
    val cb = CentroidExprs.encodeSub(Map(
      (0, 0) -> Array(0L, 0L), (0, 1) -> Array(2L, 0L),
      (1, 0) -> Array(9L, 9L), (1, 1) -> Array(1L, 1L)))
    val df = Seq((0, Seq(1L, 0L)), (1, Seq(1L, 1L)), (1, Seq(0L, 0L)))
      .toDF("j", "sub")
    val out = df.select(CentroidExprs.subspaceAssign(spark,
        col("j"), col("sub"), cb))
      .collect().map(_.getInt(0)).toSeq
    // (1,0) in j=0 ties cells 0 and 1 (d=1 both) -> lower cell 0;
    // (1,1) in j=1 is exactly cell 1; (0,0) in j=1 is nearer cell 1
    assert(out == Seq(0, 1, 1), s"got $out")
    val ex = intercept[Exception] {
      Seq((7, Seq(1L, 1L))).toDF("j", "sub")
        .select(CentroidExprs.subspaceAssign(spark,
          col("j"), col("sub"), cb)).collect()
    }
    assert(ex.getMessage.contains("subspace 7") ||
      Option(ex.getCause).exists(_.getMessage.contains("subspace 7")),
      s"got: $ex")
  }

  // ---- kernel edges, asserted directly on the expressions --------

  private def tinyDf(rows: Seq[(Long, Seq[java.lang.Long])]) = {
    import spark.implicits._
    rows.toDF("id", "codes")
  }

  private val table = CentroidExprs.encode(Map(
    0 -> Array(0L, 0L), 2 -> Array(2000L, 0L), 5 -> Array(0L, 2000L)),
    scale = 1000L)

  test("assign ties break to the LOWER cell id (HOF array_min order)") {
    // (1, 1) milli = (1000, 1000): equidistant to all three centroids
    val out = tinyDf(Seq((1L, Seq(1L, 1L))))
      .select(CentroidExprs.assignCell(spark, col("codes"), table))
      .head.getInt(0)
    assert(out == 0)
    // nudge toward cell 5: (0, 1) is distance-tied between 0 and 5
    // only after scaling — check a genuine non-tie too
    val out2 = tinyDf(Seq((1L, Seq(0L, 2L))))
      .select(CentroidExprs.assignCell(spark, col("codes"), table))
      .head.getInt(0)
    assert(out2 == 5)
  }

  test("probes order by (distance, cell) ascending and cap at nCells") {
    val out = tinyDf(Seq((1L, Seq(1L, 1L))))
      .select(CentroidExprs.probeCells(spark, col("codes"), table, 5))
      .head.getSeq[Int](0)
    assert(out == Seq(0, 2, 5), s"got $out") // all tied -> cell order
    val near5 = tinyDf(Seq((1L, Seq(0L, 2L))))
      .select(CentroidExprs.probeCells(spark, col("codes"), table, 2))
      .head.getSeq[Int](0)
    assert(near5.head == 5 && near5.size == 2, s"got $near5")
  }

  test("assignResidual returns the argmin cell and scale*x - cent") {
    val row = tinyDf(Seq((1L, Seq(0L, 2L))))
      .select(CentroidExprs.assignResidual(spark, col("codes"), table)
        .as("cr"))
      .select(col("cr.cell"), col("cr.res")).head
    assert(row.getInt(0) == 5)
    assert(row.getSeq[Long](1) == Seq(0L, 0L)) // 1000*2 - 2000
  }

  test("kernels hold against a brute-force reference on randomized " +
      "tables (ties, negatives, milli extremes)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    for (round <- 1 to 25) {
      val dim = 1 + rnd.nextInt(6)
      val nCells = 1 + rnd.nextInt(7)
      // sparse value pool FORCES distance ties (the tie-break edge)
      val pool = Array(-254000L, -1000L, 0L, 1000L, 254000L)
      val cents = (0 until nCells).map { i =>
        // non-contiguous cell ids exercise the id-carrying encode
        (i * 3 + rnd.nextInt(2)) ->
          Array.fill(dim)(pool(rnd.nextInt(pool.length)))
      }.toMap
      val flat = CentroidExprs.encode(cents, scale = 1000L)
      val codes = Array.fill(dim)((rnd.nextInt(255) - 127).toLong)
      // reference: direct (distance, cell) total order over the map
      val scored = cents.toSeq.map { case (c, cent) =>
        val d = (0 until dim).map { i =>
          val diff = 1000L * codes(i) - cent(i); diff * diff
        }.sum
        (d, c)
      }.sorted
      val expectAssign = scored.head._2
      val nProbe = 1 + rnd.nextInt(nCells)
      val expectProbes = scored.take(nProbe).map(_._2)
      val expectRes = cents(expectAssign).zip(codes)
        .map { case (m, x) => 1000L * x - m }.toSeq
      val row = Seq(Tuple1(codes.toSeq)).toDF("codes")
        .select(
          CentroidExprs.assignCell(spark, col("codes"), flat).as("a"),
          CentroidExprs.probeCells(spark, col("codes"), flat, nProbe).as("p"),
          CentroidExprs.assignResidual(spark, col("codes"), flat).as("r"))
        .head
      assert(row.getInt(0) == expectAssign, s"round $round assign")
      assert(row.getSeq[Int](1) == expectProbes, s"round $round probes")
      assert(row.getStruct(2).getInt(0) == expectAssign &&
        row.getStruct(2).getSeq[Long](1) == expectRes, s"round $round res")
    }
  }

  test("kernels compile in generated code (no silent interpreted " +
      "fallback): results correct with codegen.fallback=false") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val subTab = CentroidExprs.encodeSub(Map(
        (0, 0) -> Array(0L, 0L), (0, 1) -> Array(9L, 9L)))
      val row = tinyDf(Seq((1L, Seq(0L, 2L))))
        .select(
          CentroidExprs.assignCell(spark, col("codes"), table).as("a"),
          CentroidExprs.probeCells(spark, col("codes"), table, 2).as("p"),
          CentroidExprs.assignResidual(spark, col("codes"), table).as("r"),
          CentroidExprs.subspaceAssign(spark, lit(0), col("codes"), subTab)
            .as("s"))
        .head
      assert(row.getInt(0) == 5)
      assert(row.getSeq[Int](1).head == 5)
      assert(row.getStruct(2).getInt(0) == 5)
      assert(row.getInt(3) == 0) // (0,2) nearer (0,0) than (9,9)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("null vector -> null; wrong dim and null element fail loudly") {
    val n = tinyDf(Seq((1L, null)))
      .select(CentroidExprs.assignCell(spark, col("codes"), table))
      .head
    assert(n.isNullAt(0))
    val exDim = intercept[Exception] {
      tinyDf(Seq((1L, Seq(1L, 2L, 3L))))
        .select(CentroidExprs.assignCell(spark, col("codes"), table))
        .collect()
    }
    assert(exDim.getMessage.contains("2 dims") ||
      Option(exDim.getCause).exists(_.getMessage.contains("2 dims")),
      s"got: $exDim")
    val exNull = intercept[Exception] {
      tinyDf(Seq((1L, Seq(1L, null))))
        .select(CentroidExprs.assignCell(spark, col("codes"), table))
        .collect()
    }
    assert(exNull.getMessage.contains("null element") ||
      Option(exNull.getCause).exists(_.getMessage.contains("null element")),
      s"got: $exNull")
  }

  test("structurally equal kernels canonicalize equal (content-based " +
      "table equality enables CSE / exchange reuse)") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    import org.apache.spark.sql.types._
    val attr = AttributeReference("codes",
      ArrayType(LongType, containsNull = true))()
    // two INDEPENDENT encodes of the same map -> distinct arrays with
    // equal content; reference equality would report these unequal
    val cents = Map(0 -> Array(1L, 2L), 3 -> Array(7L, -4L))
    def mk() = CentroidExprs.wrapFlat(CentroidExprs.encode(cents, 1000L))
    val a1 = AssignCellExpr(attr, mk())
    val a2 = AssignCellExpr(attr, mk())
    assert(a1 == a2 && a1.hashCode == a2.hashCode,
      "equal-content kernels must compare equal")
    assert(a1.semanticEquals(a2),
      "equal-content kernels must be semantically equal")
    assert(a1.canonicalized == a2.canonicalized)
    val p1 = ProbeCellsExpr(attr, mk(), nProbe = 2)
    assert(p1.semanticEquals(ProbeCellsExpr(attr, mk(), nProbe = 2)))
    assert(!p1.semanticEquals(ProbeCellsExpr(attr, mk(), nProbe = 1)))
    val r1 = AssignResidualExpr(attr, mk())
    assert(r1.semanticEquals(AssignResidualExpr(attr, mk())))
    // different table content must NOT compare equal
    val other = CentroidExprs.wrapFlat(
      CentroidExprs.encode(Map(0 -> Array(9L, 9L), 3 -> Array(7L, -4L)), 1000L))
    assert(!a1.semanticEquals(AssignCellExpr(attr, other)))
    val j = AttributeReference("j", IntegerType)()
    val subTable = Map((0, 0) -> Array(1L), (0, 1) -> Array(5L))
    def mkSub() = CentroidExprs.wrapFlat(CentroidExprs.encodeSub(subTable))
    val s1 = SubspaceAssignExpr(j, attr, mkSub())
    assert(s1.semanticEquals(SubspaceAssignExpr(j, attr, mkSub())))
    // and the kernel still evaluates correctly through the wrapper
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1L, 2L)))
    assert(AssignCellExpr(
      Literal.create(Seq(1L, 2L), ArrayType(LongType)), mk())
      .eval(row) == 0)
  }
}
