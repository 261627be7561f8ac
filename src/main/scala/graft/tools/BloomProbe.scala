package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    println("bloom.enabled=" + spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"))
    println("bloom.creationSideThreshold=" + spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"))
    println("rowLevelOp=" + spark.conf.getOption("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled"))
    // store-shaped: big parquet store joined to a small drop
    val dir = "/tmp/bloomprobe"
    spark.range(2000000).select(col("id"), md5(col("id").cast("string")).as("fingerprint"))
      .write.mode("overwrite").parquet(dir + "/store")
    spark.range(500).select((col("id") * 4096).as("did"), md5((col("id") * 4096).cast("string")).as("fingerprint"))
      .write.mode("overwrite").parquet(dir + "/drop")
    val store = spark.read.parquet(dir + "/store")
    val drop = spark.read.parquet(dir + "/drop")
    val j = drop.join(store.select(col("fingerprint"), col("id").as("first_id")), Seq("fingerprint"), "left")
    val plan = j.queryExecution.executedPlan.toString
    println("HAS_BLOOM_SINGLE=" + plan.contains("might_contain"))
    // UNION application side (the multi-generation TableLayout read)
    spark.range(1000).select(col("id"), md5(col("id").cast("string")).as("fingerprint"))
      .write.mode("overwrite").parquet(dir + "/store2")
    val storeU = store.unionByName(spark.read.parquet(dir + "/store2"))
    val j2 = drop.join(storeU.select(col("fingerprint"), col("id").as("first_id")), Seq("fingerprint"), "left")
    val plan2 = j2.queryExecution.executedPlan.toString
    println("HAS_BLOOM_UNION=" + plan2.contains("might_contain"))
    println("UNION_BLOOM_COUNT=" + "might_contain".r.findAllIn(plan2).length)
    // union with an exclusion-style filter on one leg
    val storeF = store.filter(!col("id").cast("string").isin("1","2"))
      .unionByName(spark.read.parquet(dir + "/store2"))
    val j3 = drop.join(storeF.select(col("fingerprint"), col("id").as("first_id")), Seq("fingerprint"), "left")
    println("HAS_BLOOM_UNION_FILTERED=" + "might_contain".r.findAllIn(j3.queryExecution.executedPlan.toString).length)
    spark.stop()
  }
}
