package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the text-kernel hot path:
  * `sbt "runMain graft.tools.KernelBench [nDocs]"`.
  *
  * Times three shapes over the same synthetic corpus: the interpreted
  * HOF stopword family, the native `stopword_hits` kernel alone, and
  * `languageId` built ON the kernel (whose CASE references the kernel
  * 13 times textually — if whole-stage codegen's subexpression
  * elimination works, its time ≈ the kernel-alone time; if it
  * re-evaluated per reference it would be ~13x). Prints one JSON line.
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val words = Seq("the", "der", "le", "el", "alpha", "beta", "gamma",
      "delta", "value", "row", "und", "est", "por", "was", "zu")
    val docs = spark.range(n).select(col("id"),
        concat_ws(" ", (0 until 40).map(i =>
          element_at(lit(words.toArray),
            (pmod(col("id") * 31 + i * 7, lit(words.size)) + 1).cast("int"))): _*)
          .as("text"))
      .cache()
    docs.count() // materialize

    def time(name: String, c: org.apache.spark.sql.Column): (String, Double) = {
      // warm
      docs.select(c.as("x")).selectExpr("count(x)").collect()
      val t0 = System.nanoTime()
      docs.select(c.as("x")).selectExpr("count(x)").collect()
      name -> (System.nanoTime() - t0) / 1e9
    }

    val res = Seq(
      time("hof_langid", graft.functions.TextFunctions.languageId(col("text"))),
      time("kernel_hits", size(graft.functions.TextFunctions
        .stopwordHits(spark, col("text"))).cast("string")),
      time("native_langid", graft.functions.TextFunctions
        .languageId(spark, col("text"))))
    println(res.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
      .mkString(s"""{"n":$n,""", ",", "}"))
    spark.stop()
  }
}
