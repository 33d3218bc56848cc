package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.algo.{Incremental, Leiden}
import graft.run.MetricsSink

/** Structured Streaming front-end for the incremental engine.
  *
  * The reference replays cumulative edge batches through a driver loop
  * (/root/reference/src/benchmark/dynamic_graph.rs:38-56 — ordered
  * batches, no event time or late data). The streaming-native equivalent
  * is foreachBatch: every micro-batch of signed delta edges becomes one
  * HIT update against the engine state, giving exactly the reference's
  * batch-incremental semantics with a real streaming source in front
  * (Kafka/files in production; MemoryStream in tests).
  */
object StreamingUpdates {

  /** Start consuming a streaming (src, dst, weight) delta feed.
    * `onBatch` observes the state after each applied batch (e.g. to
    * checkpoint via [[graft.state.Checkpointer]]). State is held on the
    * driver as checkpointed DataFrames, so a crash resumes from the last
    * durable checkpoint exactly like the batch engine.
    */
  def start(deltas: DataFrame, initial: Incremental.State,
      cfg: Leiden.Config = Leiden.Config(),
      sink: MetricsSink = MetricsSink.discard)(
      onBatch: (Long, Incremental.State) => Unit): StreamingQuery = {
    require(deltas.isStreaming, "deltas must be a streaming DataFrame")
    var state = initial
    deltas
      .select(col("src").cast("long"), col("dst").cast("long"),
        coalesce(col("weight"), lit(1.0)).cast("double").as("weight"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val b = batch.localCheckpoint(true)
        if (!b.isEmpty) {
          state = Incremental.update(state, b, cfg, sink)
          onBatch(batchId, state)
        }
        ()
      }
      .start()
  }

  /** Windowed edge-arrival rates with a watermark — the standard
    * event-time aggregation over the delta feed (monitoring surface).
    * `deltas` must carry an event-time column `ts`. */
  def edgeRates(deltas: DataFrame, window_ : String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    deltas
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_))
      .agg(count(lit(1)).as("edges"),
        sum(when(col("weight") > 0, 1).otherwise(0)).as("inserts"),
        sum(when(col("weight") < 0, 1).otherwise(0)).as("deletes"))
}
