package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Bounded checkpoint-block retention (round-2 scale fix).
  *
  * `Dataset.localCheckpoint` persists the materialized RDD (MEMORY_AND_DISK)
  * and truncates lineage, but the blocks are only freed when the driver GCs
  * the RDD reference — on a long iterative job (CC star rounds, macro-round
  * assign/scores chains) superseded round state accumulated ~50 GB of
  * scratch disk and killed the 8–16M-row scaling runs (BENCH.md round 1).
  *
  * This helper unpersists the checkpointed RDD behind a DataFrame the moment
  * its successor round state is MATERIALIZED. Caller contract: only call on
  * a DataFrame that (a) was produced by `localCheckpoint` and (b) has no
  * remaining consumers — a localCheckpointed RDD cannot be recomputed after
  * unpersist (lineage is truncated), so freeing live state would fail the
  * next action on it.
  */
object Checkpoints {

  /** Free the persisted blocks of a localCheckpoint-ed DataFrame. No-op on
    * plans that are not checkpoint roots. Non-blocking. */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => ()
    }
}
