package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("fromDocuments produces the canonical media schema") {
    val media = Multimodal.fromDocuments(Tables.documents(spark, sf001))
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "content", "media_type", "n_bytes"))
    val r = media.filter(col("media_id") === 0L).head()
    assert(r.getAs[Array[Byte]]("content").length == r.getAs[Long]("n_bytes"))
  }

  test("decodeStub is deterministic and emits fixed-width features") {
    val media = Multimodal.fromDocuments(Tables.documents(spark, sf001)).limit(50)
    val a = Multimodal.decodeStub(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    val b = Multimodal.decodeStub(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 8))
    assert(a.values.forall(_.forall(v => v >= 0.0 && v <= 1.0)))
  }

  test("sizeBalanced yields the requested partition count") {
    val media = Multimodal.fromDocuments(Tables.documents(spark, sf001))
    val total = media.agg(sum("n_bytes")).head().getLong(0)
    val parts = Multimodal.sizeBalanced(media, targetPartitionBytes = total / 4, total)
    assert(parts.rdd.getNumPartitions == 4)
  }
}
