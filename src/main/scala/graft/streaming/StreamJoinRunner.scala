package graft.streaming

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.api.{Fields, Stream}

/** Streaming face of the per-batch join — `TridentTopology.join` semantics
  * (`JoinerMultiReducer.java:32-158`): the join scope is a SINGLE batch,
  * not cross-batch (SURVEY.md §2.6; cross-batch stream-stream joins are
  * Spark watermark joins, beyond reference semantics).
  *
  * Both sources are tagged and unioned into ONE streaming query, so every
  * micro-batch contains that trigger's tuples from both sides — the same
  * co-batching the reference gets from its shared txid. Inside
  * `foreachBatch` the sides are split back out and equi-joined with the
  * batch-face `Stream.join` (ComboList output naming, INNER or OUTER with
  * null padding).
  */
object StreamJoinRunner {

  def perBatchJoin(left: DataFrame, right: DataFrame,
                   leftKeys: Fields, rightKeys: Fields, outFields: Fields,
                   joinType: String, queryName: String,
                   sink: (DataFrame, Long) => Unit,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val lStruct = F.struct(left.columns.map(F.col).toIndexedSeq: _*)
    val rStruct = F.struct(right.columns.map(F.col).toIndexedSeq: _*)
    val lSchema = left.schema
    val rSchema = right.schema
    val tagged = left.select(F.lit(0).as("__src"), lStruct.as("__l"),
        F.lit(null).cast(org.apache.spark.sql.types.StructType(rSchema)).as("__r"))
      .unionByName(right.select(F.lit(1).as("__src"),
        F.lit(null).cast(org.apache.spark.sql.types.StructType(lSchema)).as("__l"),
        rStruct.as("__r")))
    tagged.writeStream
      .queryName(queryName)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val l = batch.where(F.col("__src") === 0).select("__l.*")
        val r = batch.where(F.col("__src") === 1).select("__r.*")
        val joined = new Stream(l).join(new Stream(r), leftKeys, rightKeys,
          outFields, joinType)
        sink(joined.toDF, batchId)
      }
      .start()
  }
}
