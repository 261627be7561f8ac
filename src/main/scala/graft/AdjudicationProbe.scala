package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 adjudication probe (builder-run evidence artifact, not a
  * driver contract):
  *
  *  1. DECOMPOSE the q_dedup_ccstar scale exponent (0.28 at the r10
  *     probe — the highest non-rebuild row): the gate bundles LSH
  *     candidate generation + large-star/small-star CC, so the
  *     exponent alone cannot say whether rounds grow (~log n, the
  *     designed cost) or per-round shuffle volume grows (would
  *     compound at 1000x). Times the two legs separately at the base
  *     SF and a 10x staging, recording ROUNDS and PER-ROUND EDGE
  *     COUNTS via the loop's observer hook.
  *
  *  2. WARM-START rebuild economics: ivfPqIndexMaintain's tripped
  *     floor pays iters+1 full-corpus scans per quantizer from a
  *     cold (lowest-id sample) init; warmStart seeds Lloyd from the
  *     live artifacts. Measures rebuild wall + post-maintain recall
  *     for cold(2 coarse iters), warm(2) and warm(1) on the same
  *     drifted index fixture.
  *
  * Output: one JSON line on stdout; full record at `outPath`
  * (default CC_PROBE.json).
  */
object AdjudicationProbe {

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val outPath = args.drop(2).headOption
      .getOrElse("/root/repo/CC_PROBE.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scaledDir = ScaleProbe.stageScaled(spark, baseDir, factor)

    // warmup (Bench discipline): JVM/codegen/reader init off the clock
    try SparkEntry.queries("q_t_c4_clean")(spark, baseDir).count()
    catch { case _: Throwable => () }
    spark.catalog.clearCache(); System.gc()

    def ccLeg(dir: String): String = {
      val docs = Tables.documents(spark, dir)
      val t0 = System.nanoTime()
      val pairs = graft.dedup.Dedup.minHashLshPairs(docs, "doc_id",
          "text", n = 3, numHashes = 64, bands = 16, threshold = 0.5)
        .select("id_a", "id_b").cache()
      val nPairs = pairs.count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      val rounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      val wallPrev = new java.util.concurrent.atomic.AtomicLong(
        System.nanoTime())
      val roundWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
      val ckpt = graft.util.TempDirs.scoped("ccprobe-ckpt").toString
      val t1 = System.nanoTime()
      graft.dedup.Dedup.connectedComponentsStar(docs, "doc_id", pairs,
          checkpointDir = Some(ckpt),
          roundObserver = (i, e) => {
            val now = System.nanoTime()
            roundWalls += (now - wallPrev.getAndSet(now)) / 1e9
            rounds += ((i, e))
          })
        .count()
      val tCc = (System.nanoTime() - t1) / 1e9
      pairs.unpersist()
      spark.catalog.clearCache(); System.gc()
      val roundsJson = rounds.zip(roundWalls).map { case ((i, e), w) =>
        f"""{"round":$i,"edges":$e,"sec":$w%.2f}"""
      }.mkString("[", ",", "]")
      f""""pairs_sec":$tPairs%.2f,"n_pairs":$nPairs,""" +
        f""""cc_sec":$tCc%.2f,"rounds":${rounds.length - 1},""" +
        f""""per_round":$roundsJson"""
    }
    val ccBase = ccLeg(baseDir)
    val ccScaled = ccLeg(scaledDir)

    // the gate fixture's floor only trips at sf0.01 (verified at r10
    // HEAD and this HEAD: at sf0.1 the appended tenth spreads evenly
    // and nProbe=2 recall stays 1.0 — nothing to rebuild), so the
    // warm-vs-cold rebuild comparison runs at the tripping SF
    val maintDir = "/root/testdata/sf0.01"
    def maintLeg(warm: Boolean, itersCoarse: Int): String = {
      val e = Tables.embeddings(spark, maintDir)
      val path = graft.util.TempDirs.scoped("adjprobe-maint").toString
      graft.similarity.Similarity.ivfPqIndexBuild(
        e.filter(col("vec_id") % 10 =!= 9), "vec_id", "embedding",
        nCells = 8, itersCoarse = 2, m = 4, ks = 4, itersPq = 1,
        path = path)
      graft.similarity.Similarity.ivfPqIndexAppend(
        e.filter(col("vec_id") % 10 === 9), "vec_id", "embedding", path)
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val rep = graft.similarity.Similarity.ivfPqIndexMaintain(
        e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 5, nProbe = 2, path = path, recallFloor = 0.999,
        itersCoarse = itersCoarse, itersPq = 1, warmStart = warm)
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); System.gc()
      f"""{"warm":$warm,"itersCoarse":$itersCoarse,""" +
        f""""wall_sec":$wall%.2f,"retrained":${rep.retrained},""" +
        f""""recall_before":${rep.recallBefore}%.4f,""" +
        f""""recall_after":${rep.recallAfter.getOrElse(-1.0)}%.4f}"""
    }
    val maint = Seq(
      maintLeg(warm = false, itersCoarse = 2),
      maintLeg(warm = true, itersCoarse = 2),
      maintLeg(warm = true, itersCoarse = 1)).mkString("[", ",", "]")

    val json =
      s"""{"metric":"adjudication_probe","factor":$factor,""" +
        s""""base":"$baseDir",""" +
        s""""ccstar_base":{$ccBase},"ccstar_scaled":{$ccScaled},""" +
        s""""maintain":$maint}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
