package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling/splitting for training-data
  * pipelines. `df.sample`/`sampleBy` draw from a per-partition RNG —
  * the sample CHANGES when the data is repartitioned, re-run, or read
  * by a different engine, which breaks train/test hygiene (a doc must
  * land in the same split today, tomorrow, and in the audit rerun).
  * These functions hash a stable key instead: membership is a pure
  * function of the key, reproducible on any engine (the hash is plain
  * 64-bit arithmetic, so the DuckDB gate recomputes it exactly).
  *
  * Hash: Knuth multiplicative (golden-ratio constant) over the key,
  * folded to a bucket in [0, 10000). Not cryptographic — keys are
  * internal ids, not adversarial input.
  */
object Sampling {

  /** Multiplicative hash of a NON-NEGATIVE long key, folded into
    * [0, 10000) — the shared primitive. Operands are kept under 2^31
    * so every intermediate fits in int64: ANSI mode (Spark 4 default)
    * would throw on a 64-bit multiply overflow rather than wrap, and
    * the same expression must evaluate identically as DuckDB SQL
    * (`((key % 2147483648) * 1597334677 + (key >> 31) * 7919) % 10000`). */
  def hashBucket(key: Column): Column =
    ((key % lit(2147483648L)) * lit(1597334677L) +
      shiftright(key, 31) * lit(7919L)) % lit(10000L)

  /** Deterministic train/valid/test split label. `trainBp`/`validBp`
    * are basis points out of 10000 (e.g. 8000/1000 = 80%/10%/10%). */
  def splitLabel(key: Column, trainBp: Int = 8000, validBp: Int = 1000): Column = {
    require(trainBp >= 0 && validBp >= 0 && trainBp + validBp <= 10000,
      "split fractions must fit in 10000 basis points")
    val b = hashBucket(key)
    when(b < trainBp, "train")
      .when(b < trainBp + validBp, "valid")
      .otherwise("test")
  }

  /** Deterministic subsample predicate: keep rows whose key hashes
    * under `keepBp` basis points (keepBp=100 ≈ 1%). Stable across
    * runs, partitionings, and engines. */
  def sampled(key: Column, keepBp: Int): Column =
    hashBucket(key) < lit(keepBp)

  /** Deterministic dataset-MIXTURE resampling: down-sample each source
    * to its target rate, given a `weights` table of (`sourceCol`,
    * `keep_bp` out of 10000) — how training corpora re-weight domains
    * (web at 30%, books at 100%, ...). The weights side is
    * dimension-sized (one row per source) so it broadcasts; membership
    * is the same engine-portable key hash as [[sampled]], so the
    * resampled corpus is bit-reproducible on any engine and stable
    * under repartitioning — re-mixing with new weights only ADDS or
    * REMOVES rows per source (nested samples), never reshuffles them. */
  def mixtureSample(df: org.apache.spark.sql.DataFrame, keyCol: String,
      sourceCol: String, weights: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.join(broadcast(weights), Seq(sourceCol))
      .filter(hashBucket(col(keyCol)) < col("keep_bp"))

  /** Deterministic fractional UPSAMPLING — mixture weights ABOVE 1.0
    * (training mixes repeat scarce high-quality sources for multiple
    * "epochs": books at 2.3x while web stays at 0.3x —
    * [[mixtureSample]] covers the down-leg, this covers the up-leg).
    * `factorBp` is the epoch factor in basis points (23000 = 2.3x):
    * every row emits `factorBp div 10000` copies, plus one more for
    * rows whose key hashes under `factorBp mod 10000` — the SAME
    * portable hash as [[sampled]], so the fractional slice is nested
    * (raising the factor only adds copies) and bit-reproducible on
    * any engine. `copy_idx` (1-based) distinguishes copies so a
    * downstream shuffle can interleave them.
    *
    * Scale shape: one map-side `explode(sequence(...))` — no shuffle,
    * no join; output size is exactly `ceil`-weighted input size. */
  def upsample(df: org.apache.spark.sql.DataFrame, keyCol: String,
      factorBp: Int): org.apache.spark.sql.DataFrame = {
    require(factorBp >= 0, "factorBp must be non-negative")
    val whole = factorBp / 10000
    val frac = factorBp % 10000
    df.withColumn("__n",
        lit(whole.toLong) +
          when(hashBucket(col(keyCol)) < frac, 1L).otherwise(0L))
      .filter(col("__n") > 0)
      .withColumn("copy_idx",
        explode(sequence(lit(1L), col("__n"))))
      .drop("__n")
  }

  // public: encoder codegen needs constructor access (see
  // graft.similarity.Similarity.Bucket)
  final case class StratumRow(stratum: String, key: Long, bucket: Long)

  /** Deterministic per-stratum EXACT-QUOTA sample: each stratum keeps
    * its `quota` lowest-hashed keys (ties broken by key) — balanced
    * training mixtures with hard per-class counts, where a rate-based
    * sample ([[mixtureSample]]) only hits the quota in expectation.
    * Strata smaller than the quota are kept whole.
    *
    * Scale shape: a naive `row_number() OVER (PARTITION BY stratum)`
    * sorts ENTIRE strata — at 100 TB a stratum is billions of rows
    * shuffled to rank rows of which only `quota` survive. Here a
    * map-side prune (bounded worst-first heap per stratum, compiled
    * mapPartitions kernel) keeps at most `quota` candidates per
    * stratum PER INPUT PARTITION, so the shuffle carries
    * `quota x partitions` rows per stratum; the window then ranks only
    * those survivors. Selection is a pure function of the key set
    * (engine-portable hash), so one SQL row_number restates it —
    * pruning provably cannot change the winners. */
  def stratifiedQuota(df: DataFrame, keyCol: String, stratumCol: String,
      quota: Int): DataFrame = {
    val ss = df.sparkSession
    import ss.implicits._
    val q = quota
    val pruned = df
      .select(col(stratumCol).cast("string").as("stratum"),
        col(keyCol).cast("long").as("key"),
        hashBucket(col(keyCol)).as("bucket"))
      .as[StratumRow]
      .mapPartitions { it =>
        // worst-first heap per stratum: head = LARGEST kept (bucket, key)
        val heaps = scala.collection.mutable.Map
          .empty[String, scala.collection.mutable.PriorityQueue[(Long, Long)]]
        it.foreach { r =>
          val h = heaps.getOrElseUpdate(r.stratum,
            new scala.collection.mutable.PriorityQueue[(Long, Long)]()(
              Ordering.Tuple2[Long, Long]))
          if (h.size < q) h.enqueue((r.bucket, r.key))
          else if (Ordering.Tuple2[Long, Long].lt((r.bucket, r.key), h.head)) {
            h.dequeue(); h.enqueue((r.bucket, r.key))
          }
        }
        heaps.iterator.flatMap { case (s, h) =>
          h.iterator.map { case (b, k) => StratumRow(s, k, b) }
        }
      }
    val w = Window.partitionBy("stratum").orderBy(col("bucket"), col("key"))
    pruned.toDF()
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= quota)
  }

  /** TEMPERATURE-SMOOTHED mixture selection — the exponent-smoothed
    * source re-weighting of multilingual LM training (sampling
    * sources ~ count^alpha with alpha < 1 so dominant sources are
    * flattened and low-resource sources keep proportionally more; the
    * p^alpha idiom of the public mBERT/XLM-R recipes): per-group
    * quotas proportional to `count_g^alpha`, then [[stratifiedQuota]]'s
    * deterministic hash-rank selection inside each group.
    *
    * `alpha` lives on the PORTABLE grid `1/2^sqrtSteps` (sqrtSteps
    * 0..6 -> alpha 1, 0.5, 0.25, ... 1/64 — brackets the published
    * 0.3-0.7 range): `count^(1/2^k)` is k applications of IEEE
    * correctly-rounded `sqrt`, bit-identical in any engine, where a
    * general libm `pow` is not. Weights integer-ize as
    * `floor(1e6 * w)` and quotas are `(totalN * wq_g) DIV W` on exact
    * int64 (ANSI throws loudly if `totalN * wq` ever overflows int64 —
    * beyond ~9e18 micro-units, far past any real configuration), so
    * the whole allocation is engine-exact — no summation-order or
    * libm drift anywhere. Floor allocation: sum of quotas <= totalN
    * (the remainder stays unselected, deterministically). Groups
    * smaller than their quota are kept whole.
    *
    * Scale shape: the quota table is group-cardinality-sized (driver
    * collect by contract, like every mixture-weights table); selection
    * reuses the bounded-heap map-side prune, so the shuffle carries
    * `quota x partitions` rows per group, never whole groups. */
  def temperatureQuota(df: DataFrame, keyCol: String, groupCol: String,
      totalN: Long, sqrtSteps: Int = 1): DataFrame = {
    require(totalN > 0, "totalN must be positive")
    require(sqrtSteps >= 0 && sqrtSteps <= 6,
      "sqrtSteps must be in [0, 6] (alpha = 1/2^sqrtSteps)")
    val ss = df.sparkSession
    import ss.implicits._
    var w: Column = col("cnt").cast("double")
    (1 to sqrtSteps).foreach(_ => w = sqrt(w))
    val quotas = df.groupBy(col(groupCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("wq", floor(w * lit(1e6)).cast("bigint"))
      .withColumn("w_all",
        sum("wq").over(Window.partitionBy())) // exact int64, order-free
      .withColumn("quota", expr(s"($totalN * wq) DIV w_all"))
      .select(col("grp"), col("quota"))
    // group-cardinality-sized by contract — the mixture-weights shape
    val qMap = quotas.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val qB = ss.sparkContext.broadcast(qMap)
    val pruned = df
      .select(col(groupCol).cast("string").as("stratum"),
        col(keyCol).cast("long").as("key"),
        hashBucket(col(keyCol)).as("bucket"))
      .as[StratumRow]
      .mapPartitions { it =>
        // the stratifiedQuota prune with a PER-GROUP bound
        val qs = qB.value
        val heaps = scala.collection.mutable.Map
          .empty[String, scala.collection.mutable.PriorityQueue[(Long, Long)]]
        it.foreach { r =>
          val q = qs.getOrElse(r.stratum, 0L)
          if (q > 0L) {
            val h = heaps.getOrElseUpdate(r.stratum,
              new scala.collection.mutable.PriorityQueue[(Long, Long)]()(
                Ordering.Tuple2[Long, Long]))
            if (h.size < q) h.enqueue((r.bucket, r.key))
            else if (Ordering.Tuple2[Long, Long].lt((r.bucket, r.key), h.head)) {
              h.dequeue(); h.enqueue((r.bucket, r.key))
            }
          }
        }
        heaps.iterator.flatMap { case (s, h) =>
          h.iterator.map { case (b, k) => StratumRow(s, k, b) }
        }
      }
    pruned.toDF()
      .withColumnRenamed("stratum", "grp")
      .withColumn("rk", row_number().over(
        Window.partitionBy("grp").orderBy(col("bucket"), col("key")))
        .cast("bigint"))
      .join(broadcast(quotas), Seq("grp"))
      .filter(col("rk") <= col("quota"))
      .select(col("grp"), col("key"), col("rk"), col("quota"))
  }

  /** Fine-grained portable hash: same multiplicative scheme as
    * [[hashBucket]] but folded to [0, 1e9) — enough resolution to
    * order a billion-row stratum with negligible collision mass (and
    * collisions only cost a deterministic id tie-break, not bias). */
  def hash9(key: Column): Column =
    ((key % lit(2147483648L)) * lit(1597334677L) +
      shiftright(key, 31) * lit(7919L)) % lit(1000000000L)

  final case class PriRow(stratum: String, key: Long, pri: Double)

  /** WEIGHTED sampling without replacement, k per stratum — sequential
    * Poisson / priority sampling (Ohlsson 1998; Duffield et al. 2007,
    * both public): each row draws priority `u / w` with u uniform on
    * (0,1) and keeps the k SMALLEST per stratum, which approximates
    * probability-proportional-to-size without replacement. How corpora
    * sample by quality/length weight reproducibly.
    *
    * Determinism + engine portability: u = (hash9(key) + 0.5) / 1e9 —
    * so the priority is one IEEE division of an exactly-representable
    * numerator by the caller's positive integer weight; both engines
    * compute the bit-identical double, and (pri, key) ordering breaks
    * the (measure-zero) collisions. NO libm in the ranking (an `ln`,
    * as in textbook Efraimidis-Espirakis `u^(1/w)`, may differ in the
    * last ulp across runtimes and flip near-ties).
    *
    * Scale shape: same as [[stratifiedQuota]] — a map-side bounded
    * heap prunes every partition to <= k rows per stratum BEFORE the
    * shuffle, so the window sees at most `k * partitions` rows per
    * stratum regardless of corpus size. Weights must be positive;
    * non-positive rows are dropped (they'd have infinite priority
    * anyway).
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, stratumCol: String): DataFrame = {
    val ss = df.sparkSession
    import ss.implicits._
    val kk = k
    val pruned = df
      .filter(col(weightCol) > 0)
      .select(col(stratumCol).cast("string").as("stratum"),
        col(keyCol).cast("long").as("key"),
        ((hash9(col(keyCol)).cast("double") + lit(0.5)) /
          col(weightCol).cast("double")).as("pri"))
      .as[PriRow]
      .mapPartitions { it =>
        val ord = Ordering.Tuple2[Double, Long]
        val heaps = scala.collection.mutable.Map
          .empty[String, scala.collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { r =>
          val h = heaps.getOrElseUpdate(r.stratum,
            new scala.collection.mutable.PriorityQueue[(Double, Long)]()(ord))
          if (h.size < kk) h.enqueue((r.pri, r.key))
          else if (ord.lt((r.pri, r.key), h.head)) {
            h.dequeue(); h.enqueue((r.pri, r.key))
          }
        }
        heaps.iterator.flatMap { case (s, h) =>
          h.iterator.map { case (p, key) => PriRow(s, key, p) }
        }
      }
    val w = Window.partitionBy("stratum").orderBy(col("pri"), col("key"))
    pruned.toDF()
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
  }

  /** Full-range seeded shuffle hash: [[hashBucket]]'s under-2^31
    * arithmetic with the seed folded in, spread over [0, 2^31) — fine
    * enough that collisions cost only a deterministic key tie-break.
    * Every intermediate stays under 2^63 (ANSI-safe) and the whole
    * expression evaluates identically as DuckDB SQL. */
  def shuffleHash(key: Column, seed: Long): Column = {
    require(seed >= 0 && seed < 2147483648L, "seed must fit in [0, 2^31)")
    ((key % lit(2147483648L)) * lit(1597334677L) +
      shiftright(key, 31) * lit(7919L) +
      lit(seed) * lit(2654435761L)) % lit(2147483648L)
  }

  /** Deterministic corpus SHUFFLE with explicit global positions —
    * the reproducible training-order export. Every epoch/rerun/engine
    * must agree on position `i`'s document, so the order is a pure
    * function of (key, seed): ascending ([[shuffleHash]], key).
    *
    * Scale shape — a global `row_number()` window would move the
    * whole corpus to ONE partition, so instead:
    *   1. range-shard the hash (`shard = h / ceil(2^31/shards)` —
    *      monotonic in h, so shard order IS global order);
    *   2. `row_number` per shard (shuffle on shard key, corpus-sized
    *      but parallel);
    *   3. global position = per-shard rank + the shard's cumulative
    *      offset — offsets come from a shards-sized count aggregate
    *      (the only global window runs over <= `shards` rows) and
    *      broadcast back.
    * Two corpus shuffles total (the per-shard sort window + its agg
    * sharing the same exchange), nothing corpus-sized ever on one
    * core. New epoch = new seed, full re-shuffle, zero state.
    *
    * Output: input row + `pos` in [0, n) — a permutation, bit-stable
    * across runs, partitionings, and engines. */
  def shuffledPositions(df: DataFrame, keyCol: String, seed: Long,
      shards: Int = 1024): DataFrame = {
    require(shards >= 1, "shards must be positive")
    val width = (2147483648L + shards - 1) / shards
    val withShard = df
      .withColumn("__h", shuffleHash(col(keyCol), seed))
      .withColumn("__shard", (col("__h") / lit(width)).cast("long"))
    val offsets = withShard.groupBy("__shard")
      .agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum("__n").over(Window.orderBy("__shard")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    val within = row_number().over(
      Window.partitionBy("__shard").orderBy(col("__h"), col(keyCol)))
    withShard.join(broadcast(offsets), Seq("__shard"))
      .withColumn("pos", col("__offset") + within.cast("long") - 1L)
      .drop("__h", "__shard", "__offset")
  }

  /** Token-BUDGETED per-source selection — how training mixes are
    * actually specified ("200 B tokens of web, 30 B of code"), as
    * opposed to [[mixtureSample]]'s per-document keep rates. Each
    * source keeps its documents in deterministic-shuffle order
    * (ascending [[shuffleHash]], then key) until the source's token
    * budget is exhausted: a doc is kept iff the running token total
    * through that doc is <= `token_budget`. Nested under budget
    * growth — raising a budget only ADDS documents, never swaps them.
    *
    * Scale shape (the [[shuffledPositions]] range-shard idiom, per
    * source): a per-source `sum() OVER (ORDER BY hash)` window would
    * sort each source's full corpus on however many cores its hash
    * range lands on — and the budget cut typically keeps a tiny prefix
    * of a huge source, so almost all of that sort is wasted. Instead:
    *   1. range-shard the hash; per-(source, shard) token sums are one
    *      map-side-combined aggregate, and per-source prefix offsets
    *      over that (sources x shards)-sized table are the only
    *      cross-shard window;
    *   2. shards whose offset already exceeds the budget are dropped
    *      BEFORE the sort window — the exact cumulative sum only runs
    *      inside shards that can still contribute (for a source kept
    *      at 1%, ~99% of its rows never enter a sort);
    *   3. kept row: shard offset + within-shard running sum <= budget.
    *
    * `budgets`: one row per source, (`sourceCol`, `token_budget`) —
    * dimension-sized, broadcast. Output: kept rows + `cum_tokens`, the
    * source-global running total through each kept document. */
  def tokenBudgetSample(df: DataFrame, keyCol: String, sourceCol: String,
      tokenCol: String, budgets: DataFrame, seed: Long = 17L,
      shards: Int = 256): DataFrame = {
    require(shards >= 1, "shards must be positive")
    val width = (2147483648L + shards - 1) / shards
    val withShard = df
      .withColumn("__h", shuffleHash(col(keyCol), seed))
      .withColumn("__shard", (col("__h") / lit(width)).cast("long"))
    val offsets = withShard.groupBy(sourceCol, "__shard")
      .agg(sum(col(tokenCol)).as("__t"))
      .withColumn("__offset",
        coalesce(sum("__t").over(Window.partitionBy(sourceCol)
          .orderBy("__shard")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__t")
    val withinShardCum = sum(col(tokenCol)).over(
      Window.partitionBy(col(sourceCol), col("__shard"))
        .orderBy(col("__h"), col(keyCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    withShard
      .join(broadcast(offsets), Seq(sourceCol, "__shard"))
      .join(broadcast(budgets), Seq(sourceCol))
      // <= not <: a shard whose offset EQUALS the budget can still
      // contribute zero-token docs at its hash-order start (their
      // running total stays == budget, which the contract keeps);
      // any positive-token doc there exceeds the budget and drops in
      // the exact filter below
      .where(col("__offset") <= col("token_budget"))
      .withColumn("cum_tokens", col("__offset") + withinShardCum)
      .where(col("cum_tokens") <= col("token_budget"))
      .drop("__h", "__shard", "__offset")
  }
}
