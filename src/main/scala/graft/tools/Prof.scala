package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch profiler for lshTopK internals (temporary tooling). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val e = graft.Tables.embeddings(spark, d)
    time("count")(e.count())
    val q = e.filter(col("vec_id") < 10)
    import graft.similarity.Similarity
    time("lshTopK-full")(Similarity.lshTopK(q, e, "vec_id", "embedding", 5).count())
    time("lshTopK-again")(Similarity.lshTopK(q, e, "vec_id", "embedding", 5).count())
    spark.stop()
  }
}
