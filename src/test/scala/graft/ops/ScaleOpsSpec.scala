package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin == plain join (inner and left)") {
    val li = Tables.lineitem(spark, sf)
    val part = Tables.part(spark, sf)
      .withColumnRenamed("p_partkey", "l_partkey")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_partkey").agg(count(lit(1)).as("n"),
        round(sum("p_retailprice"), 2).as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = canon(li.join(part, Seq("l_partkey")))
    val salted = canon(ScaleOps.saltedJoin(li, part, "l_partkey", 8))
    assert(plain == salted)
    val plainLeft = li.join(part, Seq("l_partkey"), "left").count()
    val saltedLeft = ScaleOps.saltedJoin(li, part, "l_partkey", 8, "left").count()
    assert(plainLeft == saltedLeft)
  }

  test("saltedAgg == plain aggregation") {
    val li = Tables.lineitem(spark, sf)
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = ScaleOps.saltedAgg(li, "l_returnflag", 8,
        partial = Seq(sum("l_quantity").as("q"), count(lit(1)).as("n")),
        combine = Seq(sum("q").as("q"), sum("n").as("n")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(plain == salted)
  }

  test("bucketed tables join without an Exchange on either side") {
    // (warehouse dir is a static conf — managed tables land in the
    // default ./spark-warehouse and are dropped at the end; also clear
    // any stale location from an interrupted run)
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS or_bkt")
    Seq("li_bkt", "or_bkt").foreach { t =>
      val p = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
    val or = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    ScaleOps.writeBucketed(li, "li_bkt", "l_orderkey", 8)
    ScaleOps.writeBucketed(or, "or_bkt", "l_orderkey", 8)
    // at fixture size Spark would broadcast (hiding the bucket payoff);
    // disable broadcast to observe the bucket-aware join shape the
    // tables would take at fact-to-fact scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt").join(spark.table("or_bkt"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucket-aware scan expected:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS or_bkt")
    }
  }

  test("compactPath: fewer files at the computed count, content byte-identical") {
    val dir = graft.util.TempDirs.scoped("graft-compact").toString
    val docs = Tables.documents(spark, sf)
    docs.repartition(16).write.mode("overwrite").parquet(dir + "/frag")
    def parquetFiles(p: String): Array[org.apache.hadoop.fs.FileStatus] = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(hp)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    }
    val fragFiles = parquetFiles(dir + "/frag")
    assert(fragFiles.length == 16)
    // target sized to force a 2+-file result so the ceil math is
    // actually exercised (not just the n=1 collapse)
    val total = fragFiles.map(_.getLen).sum
    val target = total / 3 + 1
    val n = ScaleOps.compactPath(spark, dir + "/frag", dir + "/out", target)
    assert(n == math.ceil(total.toDouble / target).toInt && n >= 2 && n < 16)
    assert(parquetFiles(dir + "/out").length == n)
    val before = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = spark.read.parquet(dir + "/out").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == before)
  }
}
