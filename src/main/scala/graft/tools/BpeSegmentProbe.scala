package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Production-vocabulary probe for the native BPE segmentation kernel:
  * `sbt "runMain graft.tools.BpeSegmentProbe [numMerges] [nDocs] [vocab]"`.
  *
  * The star-schema documents table exhausts BPE training at ~90 merges
  * (word-salad over a tiny vocabulary), so the probe builds a
  * deterministic synthetic corpus with a `vocab`-word vocabulary
  * (default 30k distinct words, 100k docs x 30 words) — rich enough to
  * sustain a production-scale merge list. It then times
  * [[graft.functions.Bpe.segmentFast]] at the FULL merge table — a
  * depth at which the nested-transform twin cannot even be ANALYZED
  * (lambda resolution burns one analyzer Resolution iteration per
  * nesting level; maxIterations is 100) — plus the twin at the depths
  * it survives, and records the twin's wall. Prints one JSON line. */
object BpeSegmentProbe {
  def main(args: Array[String]): Unit = {
    val numMerges = args.lift(0).map(_.toInt).getOrElse(2000)
    val nDocs = args.lift(1).map(_.toInt).getOrElse(100000)
    val vocab = args.lift(2).map(_.toInt).getOrElse(30000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic vocabulary (driver-built, vocab-sized by contract)
    def mix(x0: Long): Long = {
      var z = (x0 + 0x9E3779B97F4A7C15L) * 0xBF58476D1CE4E5B9L
      z ^= z >>> 31; z *= 0x94D049BB133111EBL; z ^ (z >>> 29)
    }
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val words: Array[String] = (0 until vocab).map { v =>
      val len = 3 + (mix(v.toLong) & 0x7fffffffL).toInt % 9
      (0 until len).map(j =>
        alpha((mix(v.toLong * 131 + j) & 0x7fffffffL).toInt
          % alpha.length)).mkString
    }.toArray
    val wordsLit = lit(words)
    val docs = spark.range(nDocs).select(col("id"),
        concat_ws(" ", (0 until 30).map(j =>
          element_at(wordsLit,
            (pmod(xxhash64(col("id") * 31 + j), lit(vocab)) + 1)
              .cast("int"))): _*).as("text"))
      .cache()
    docs.count()

    var t0 = System.nanoTime()
    val merges = graft.functions.Bpe.train(docs, "text", numMerges)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val trainSec = (System.nanoTime() - t0) / 1e9

    def timeFast(): Double = {
      t0 = System.nanoTime()
      graft.functions.Bpe.segmentFast(docs, "text", merges)
        .agg(sum("n_symbols")).head()
      (System.nanoTime() - t0) / 1e9
    }
    timeFast() // warm
    val fastSec = timeFast()

    val twin = Seq(30, 60, 90).map { m =>
      t0 = System.nanoTime()
      graft.functions.Bpe.segment(docs, "text", merges.take(m))
        .agg(sum("n_symbols")).head()
      m -> (System.nanoTime() - t0) / 1e9
    }
    val wall =
      if (merges.length < 150) "corpus-exhausted-early"
      else try {
        graft.functions.Bpe.segment(docs, "text", merges.take(150))
          .agg(sum("n_symbols")).head()
        "planned-unexpectedly"
      } catch { case e: Throwable => e.getClass.getSimpleName }

    println(s"""{"docs":$nDocs,"vocab":$vocab,"merges":${merges.length},""" +
      f""""train_sec":$trainSec%.1f,"segment_fast_sec":$fastSec%.2f,""" +
      twin.map { case (m, s) => f""""segment_twin_${m}_sec":$s%.2f""" }
        .mkString(",") +
      s""","twin_at_150":"$wall"}""")
    spark.stop()
  }
}
