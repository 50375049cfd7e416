package graft.ops

import org.apache.spark.sql.Dataset

/** Deployment-aware eager lineage cut — the one place the engine decides
  * HOW to materialize-and-truncate a frame.
  *
  * `localCheckpoint(eager = true)` stores blocks NON-reliably on
  * executors: exactly right in local mode (driver and executor share one
  * JVM and one fate, so the blocks cannot outlive anything that needs
  * them) and exactly wrong under executor loss or dynamic allocation,
  * where a vanished block FAILS the query instead of recomputing — a
  * truncated lineage cannot be rebuilt. So the cut is chosen by
  * deployment:
  *
  *  - local master → `localCheckpoint(eager = true)` (the measured
  *    local-mode posture; every committed bench/scale record runs here);
  *  - cluster with `spark.checkpoint.dir` set → reliable
  *    `checkpoint(eager = true)` (survives executor loss);
  *  - cluster WITHOUT a checkpoint dir → `localCheckpoint` still (the
  *    iterative callers — connected components, PageRank, BPE — require
  *    the cut for correctness of cost: without it each round recomputes
  *    the whole prefix), with a once-per-JVM WARN telling the operator
  *    to set a checkpoint dir for executor-loss safety.
  *
  * [[org.apache.spark.sql.GraftBridge.releaseCheckpoint]] is a no-op on
  * frames that were never cut, so release sites need no matching guard.
  */
object Checkpoints {

  private val warnedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)

  implicit final class EagerCutOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** Eagerly materialize `ds` and truncate its lineage (see
      * [[Checkpoints]] for the deployment-dependent mechanism).
      */
    def eagerCut(): Dataset[T] = {
      val sc = ds.sparkSession.sparkContext
      if (sc.isLocal) ds.localCheckpoint(eager = true)
      else if (sc.getCheckpointDir.isDefined) ds.checkpoint(eager = true)
      else {
        if (warnedOnce.compareAndSet(false, true))
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            "eagerCut on a cluster without spark.checkpoint.dir: falling " +
              "back to localCheckpoint, whose non-reliable blocks fail the " +
              "query under executor loss / dynamic allocation — set a " +
              "checkpoint dir to get reliable cuts")
        ds.localCheckpoint(eager = true)
      }
    }
  }
}
