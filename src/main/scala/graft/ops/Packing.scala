package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing — assemble tokenized documents into fixed-budget
  * context windows ("bins") for LLM training, the step between
  * filtering/dedup and the trainer's data loader.
  *
  * Greedy sequential packing is inherently a stateful scan (each bin
  * decision depends on the running fill), which does not distribute as
  * a window function. The scalable restatement: bins never cross
  * `(group, shard)` boundaries, where a shard is a fixed id range —
  * packing becomes embarrassingly parallel across shards and the
  * per-shard scan is a streaming fold over a sorted partition
  * (secondary-sort idiom: repartition on the shard key +
  * `sortWithinPartitions` + `mapPartitions`, O(1) memory per row, no
  * per-group materialization). At 100 TB the shard span bounds both
  * task skew and the loss of fill efficiency at shard seams (one
  * partially-filled bin per shard tail, amortized away by span size).
  *
  * The greedy rule, identical in the DuckDB oracle's recursive
  * restatement: docs are visited in ascending id order; a doc whose
  * tokens no longer fit (`fill + toks > budget`) opens the next bin.
  * Per-doc token counts are capped at `budget` so oversized docs
  * occupy a bin alone (the trainer-side truncation contract) rather
  * than wedging the scan.
  */
object Packing {

  /** Per-doc bin assignment: `(grp, shard, doc_id, toks, bin)` with
    * `bin` numbered from 0 within each `(grp, shard)`. `toksCol` is
    * any integral token-count expression; it is capped at `budget`. */
  def packGreedy(df: DataFrame, groupCol: String, idCol: String,
      toksCol: Column, budget: Long, shardSpan: Long): DataFrame = {
    require(budget > 0 && shardSpan > 0, "budget and shardSpan must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("grp"),
        // floor (not `div`): matches DuckDB `//`; identical for the
        // non-negative ids here, and floor stays correct if ids go
        // negative upstream
        floor(col(idCol).cast("long") / shardSpan).cast("long").as("shard"),
        col(idCol).cast("long").as("doc_id"),
        least(toksCol.cast("long"), lit(budget)).as("toks"))
      .repartition(col("grp"), col("shard"))
      .sortWithinPartitions("grp", "shard", "doc_id")
      .as[(String, Long, Long, Long)]
      .mapPartitions { rows =>
        var curGrp: String = null
        var curShard = Long.MinValue
        var fill = 0L
        var bin = -1L
        rows.map { case (grp, shard, docId, toks) =>
          if (grp != curGrp || shard != curShard) {
            curGrp = grp; curShard = shard; fill = 0L; bin = -1L
          }
          if (bin < 0 || fill + toks > budget) { bin += 1; fill = toks }
          else fill += toks
          (grp, shard, docId, toks, bin)
        }
      }
      .toDF("grp", "shard", "doc_id", "toks", "bin")
  }

  /** Bin-grain summary: docs per bin, fill, id range — the shape a
    * loader manifest wants, and the hash-comparable contract. */
  def packSummary(assignments: DataFrame): DataFrame =
    assignments.groupBy("grp", "shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("fill_toks"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("grp", "shard", "bin")
}
