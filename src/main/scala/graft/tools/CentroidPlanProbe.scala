package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan-bloat probe for the coarse-centroid carrier:
  * `sbt "runMain graft.tools.CentroidPlanProbe [dim] [cells...]"`
  * (defaults: dim=768, cells=256,1024,4096).
  *
  * For each cell count it builds a deterministic cells x dim centroid
  * table and measures, for BOTH the literal-HOF path and the
  * expression-object carrier (forced via
  * `spark.graft.ann.centroidLiteralMaxCoeffs`), the costs that scale
  * with the PLAN rather than the data:
  *   - plan construction + analysis wall (the per-Lloyd-iteration
  *     rebuild cost: kmeansTrain reconstructs the assign plan every
  *     iteration);
  *   - optimizer wall (every rule walks every literal node);
  *   - total expression-tree node count in the analyzed plan;
  *   - execution wall over a tiny fixed corpus (64 rows — isolates
  *     plan/codegen overhead from data work).
  * Prints one JSON line per (path, cells). Expected shape: literal
  * grows superlinearly in cells x dim on every axis; carrier stays
  * flat (the table rides the expression object, one plan node). */
object CentroidPlanProbe {
  def main(args: Array[String]): Unit = {
    val dim = args.lift(0).map(_.toInt).getOrElse(768)
    val cellCounts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(256, 1024, 4096)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def mix(x0: Long): Long = {
      var z = (x0 + 0x9E3779B97F4A7C15L) * 0xBF58476D1CE4E5B9L
      z ^= z >>> 31; z *= 0x94D049BB133111EBL; z ^ (z >>> 29)
    }

    // tiny fixed corpus of int8-style codes (array<bigint>)
    val corpus = spark.range(64).select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          d => pmod(xxhash64(col("id") * lit(dim) + d), lit(255)) - 127)
          .as("codes"))
      .cache()
    corpus.count()

    def exprNodes(df: org.apache.spark.sql.DataFrame): Long = {
      var n = 0L
      df.queryExecution.analyzed.foreach(pl =>
        pl.expressions.foreach(e => e.foreach(_ => n += 1)))
      n
    }

    for (cells <- cellCounts) {
      val cents: Map[Int, Array[Long]] = (0 until cells).map { c =>
        c -> Array.tabulate(dim)(d =>
          (mix(c.toLong * dim + d) % 127000L))
      }.toMap
      for ((path, conf) <- Seq(
          ("literal", Long.MaxValue.toString), ("carrier", "0"))) {
        spark.conf.set("spark.graft.ann.centroidLiteralMaxCoeffs", conf)
        var t0 = System.nanoTime()
        val assigned = graft.similarity.Similarity
          .withAssignedCell(corpus, "codes", cents)
          .select(col("id"), col("cell"))
        val analyzed = assigned.queryExecution.analyzed
        val analyzeSec = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        assigned.queryExecution.optimizedPlan
        val optimizeSec = (System.nanoTime() - t0) / 1e9
        val nodes = exprNodes(assigned)
        t0 = System.nanoTime()
        val rows = assigned.count()
        val execSec = (System.nanoTime() - t0) / 1e9
        // the Lloyd-loop shape: the plan is REBUILT per iteration
        t0 = System.nanoTime()
        (1 to 3).foreach { _ =>
          graft.similarity.Similarity
            .withAssignedCell(corpus, "codes", cents)
            .queryExecution.optimizedPlan
        }
        val rebuild3Sec = (System.nanoTime() - t0) / 1e9
        println(s"""{"probe":"centroid_plan","path":"$path"""" +
          s""","cells":$cells,"dim":$dim,"coeffs":${cells.toLong * dim}""" +
          f""","analyze_sec":$analyzeSec%.3f,"optimize_sec":$optimizeSec%.3f""" +
          s""","expr_nodes":$nodes,"exec_rows":$rows""" +
          f""","exec_sec":$execSec%.3f,"rebuild3_sec":$rebuild3Sec%.3f}""")
      }
    }
    spark.conf.unset("spark.graft.ann.centroidLiteralMaxCoeffs")
    spark.stop()
  }
}
