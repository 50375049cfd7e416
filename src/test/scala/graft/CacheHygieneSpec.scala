package graft

/** Session-state hygiene across the WHOLE query registry — the round-3
  * bench instability was cached/checkpointed blocks accumulating across 70
  * queries (each CC round used to leak one superseded label checkpoint).
  *
  * For every registered query: materialize it (noop sink, all columns
  * computed), then assert the persistent-RDD count is bounded by the few
  * blocks that legitimately back the RETURNED frame (a result built on a
  * localCheckpoint cannot release itself before the caller consumes it),
  * and that an explicit sweep empties the context completely. Unbounded
  * growth — the leak mode — fails the bound immediately.
  */
class CacheHygieneSpec extends SparkSpec {

  // result-backing checkpoints a query may legitimately leave behind:
  // final CC labels (1) or a checkpointed pair frame (1) — anything above
  // this is a per-round/per-stage leak
  private val MaxResidentRdds = 2

  test("no query leaves more than its result-backing blocks; sweep empties all") {
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, sf001).write.mode("overwrite").format("noop").save()
      val resident = sc.getPersistentRDDs.size
      assert(resident <= MaxResidentRdds,
        s"$name left $resident persistent RDDs (> $MaxResidentRdds): leak")
      spark.catalog.clearCache()
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      assert(sc.getPersistentRDDs.isEmpty, s"$name: sweep left persistent RDDs")
    }
  }
}
