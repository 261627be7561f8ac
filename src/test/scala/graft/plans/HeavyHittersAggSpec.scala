package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class HeavyHittersAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** (item, est) pairs from a heavy_hitters run over one string col. */
  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(HeavyHittersAgg.heavyHitters(spark, col("v"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Zipf-ish stream: item i appears n/i times (i = 1..40), shuffled
    * deterministically across the frame. */
  private def zipf(parts: Int) = {
    import spark.implicits._
    val rows = for { i <- 1 to 40; j <- 1 to (2000 / i) } yield s"item-$i"
    // deterministic interleave so partitions see mixed, not sorted, data
    rows.sortBy(s => (s.hashCode * 2654435761L) & 0xffffffffL)
      .toDF("v").repartition(parts)
  }

  test("MG guarantee: every key above n/(k+1) present, est within bound") {
    val k = 8
    val df = zipf(7)
    val n = df.count()
    val exact = df.groupBy("v").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hh = sketch(df, k)
    assert(hh.size <= k)
    val bound = n / (k + 1)
    exact.filter(_._2 > bound).foreach { case (item, cnt) =>
      val est = hh.get(item)
      assert(est.isDefined, s"$item (count $cnt > $bound) missing from sketch")
      assert(est.get <= cnt, s"$item over-estimated: ${est.get} > $cnt")
      assert(cnt - est.get <= bound,
        s"$item undercount ${cnt - est.get} exceeds n/(k+1)=$bound")
    }
    // no estimate may exceed its true count (MG never over-counts)
    hh.foreach { case (item, est) =>
      assert(est <= exact(item), s"$item estimate $est > true ${exact(item)}")
    }
  }

  test("guarantee holds across repartitionings (mergeable summaries)") {
    val k = 8
    for (parts <- Seq(1, 3, 32)) {
      val df = zipf(parts)
      val n = df.count()
      val bound = n / (k + 1)
      val exact = df.groupBy("v").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val hh = sketch(df, k)
      exact.filter(_._2 > bound).foreach { case (item, cnt) =>
        assert(hh.contains(item), s"parts=$parts: $item missing")
        assert(hh(item) <= cnt && cnt - hh(item) <= bound,
          s"parts=$parts: $item est ${hh(item)} outside [${cnt - bound}, $cnt]")
      }
    }
  }

  test("fewer distinct keys than k -> exact counts") {
    import spark.implicits._
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("v").repartition(4)
    val hh = sketch(df, 16)
    assert(hh === Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("nulls are skipped; empty input -> empty sketch") {
    import spark.implicits._
    val withNulls = Seq(Some("x"), None, Some("x"), None).toDF("v")
    assert(sketch(withNulls, 4) === Map("x" -> 2L))
    assert(sketch(Seq.empty[String].toDF("v"), 4) === Map.empty)
  }

  test("grouped usage: independent sketches per group") {
    import spark.implicits._
    val df = (Seq.fill(10)(("g1", "a")) ++ Seq.fill(2)(("g1", "b")) ++
      Seq.fill(7)(("g2", "z"))).toDF("g", "v").repartition(3)
    val rows = df.groupBy("g")
      .agg(HeavyHittersAgg.heavyHitters(spark, col("v"), 4).as("hh"))
      .select(col("g"), explode(col("hh")).as("e"))
      .select(col("g"), col("e.item"), col("e.est"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows === Set(("g1", "a", 10L), ("g1", "b", 2L), ("g2", "z", 7L)))
  }

  test("streaming aggregation: sketch state merges across micro-batches") {
    import spark.implicits._
    val k = 8
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-stream")
    val drops = java.nio.file.Files.createDirectory(dir.resolve("drops"))
    def stage(rows: Seq[String], name: String): Unit = {
      val tmp = dir.resolve(name + ".tmpdir").toString
      rows.toDF("v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, drops.resolve(name))
    }
    // two drops with DIFFERENT hot keys — the merged sketch must carry
    // drop-1 heavy hitters through the state store into the final answer
    val d1 = (1 to 12).flatMap(i => Seq.fill(1200 / i)(s"a-$i"))
    val d2 = (1 to 12).flatMap(i => Seq.fill(1200 / i)(s"b-$i"))
    stage(d1, "d1.parquet")
    stage(d2, "d2.parquet")
    val q = spark.readStream.schema("v STRING")
      .option("maxFilesPerTrigger", 1) // force 2 micro-batches
      .parquet(drops.toString)
      .agg(HeavyHittersAgg.heavyHitters(spark, col("v"), k).as("hh"))
      .writeStream.format("memory").queryName("hh_stream_test")
      .outputMode("complete")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000)); q.stop()
    val hh = spark.table("hh_stream_test")
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = d1 ++ d2
    val n = all.size.toLong
    val bound = n / (k + 1)
    val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val trueHH = exact.filter(_._2 > bound)
    assert(trueHH.nonEmpty, "fixture must contain true heavy hitters")
    // both drops' hot keys must survive the cross-micro-batch merge
    assert(trueHH.keys.exists(_.startsWith("a-")))
    assert(trueHH.keys.exists(_.startsWith("b-")))
    trueHH.foreach { case (item, cnt) =>
      assert(hh.contains(item), s"$item missing from streamed sketch")
      assert(hh(item) <= cnt && cnt - hh(item) <= bound,
        s"$item est ${hh(item)} outside [${cnt - bound}, $cnt]")
    }
  }

  test("SQL registration via extensions name") {
    import spark.implicits._
    HeavyHittersAgg.register(spark)
    Seq("a", "a", "b").toDF("v").createOrReplaceTempView("hh_in")
    val out = spark.sql(
      "SELECT heavy_hitters(v, 4) AS hh FROM hh_in")
      .select(explode(col("hh")).as("e")).select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 2L, "b" -> 1L))
  }
}
