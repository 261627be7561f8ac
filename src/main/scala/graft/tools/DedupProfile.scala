package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the near-dup operators: stage-by-stage row counts
  * and wall times over an sf dir's documents table. Not part of the
  * driver contract — a diagnosis tool for picking candidate caps and
  * verification strategies. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-dedup-profile")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    println(s"[profile] docs = ${docs.count()}")

    // --- winnow stages
    val fpsAll = docs.select(col("doc_id"),
      explode(graft.plans.WinnowFingerprintsExpr.winnowFingerprints(
        spark, col("text"), 8, 4)).as("fp")).cache()
    timed("fpsAll rows")(println(s"  = ${fpsAll.count()}"))
    val cap = math.max(5L, math.ceil(docs.count() * 0.04).toLong)
    val rare = fpsAll.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= cap).select("fp")
    val fps = fpsAll.join(rare, Seq("fp"), "left_semi").cache()
    timed("fps under cap")(println(s"  = ${fps.count()}  (cap=$cap)"))
    val candidates = fps.as("a")
      .join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    timed("candidate join rows")(println(s"  = ${candidates.count()}"))
    val dist = candidates.distinct().cache()
    timed("distinct pairs")(println(s"  = ${dist.count()}"))

    val sh = graft.dedup.Dedup.shingles(docs, "doc_id", "text", 3).cache()
    timed("shingle rows")(println(s"  = ${sh.count()}"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val sized = dist
      .join(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .filter(least(col("n_a"), col("n_b")).cast("double") >=
        lit(0.5) * greatest(col("n_a"), col("n_b")) - lit(1e-9)).cache()
    timed("size-filtered pairs")(println(s"  = ${sized.count()}"))
    val candIds = sized.select(col("id_a").as("doc_id"))
      .union(sized.select(col("id_b"))).distinct().cache()
    timed("cand ids")(println(s"  = ${candIds.count()}"))
    val shCand = sh.join(candIds, Seq("doc_id"), "left_semi").cache()
    timed("shCand rows")(println(s"  = ${shCand.count()}"))
    val shared = shCand.as("a")
      .join(shCand.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    timed("shared-count rows")(println(s"  = ${shared.count()}"))
    val out = sized.join(shared, Seq("id_a", "id_b"))
      .filter(col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")).cast("double") >= 0.5)
    timed("final pairs")(println(s"  = ${out.count()}"))
    spark.stop()
  }
}
