package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.algo.Incremental
import graft.streaming.StreamingUpdates

/** Streaming delta feed -> incremental engine via foreachBatch, and the
  * watermarked edge-rate aggregation. */
class StreamingSpec extends SparkSpecBase {

  test("foreachBatch applies streaming deltas as HIT updates") {
    val s = spark
    import s.implicits._
    // initial: two separate pairs
    val init = Incremental.initial(edges((0L, 1L, 1.0), (2L, 3L, 1.0)))

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Double)]
    val deltas = stream.toDF().toDF("src", "dst", "weight")

    var states = Vector.empty[(Long, Incremental.State)]
    val q = StreamingUpdates.start(deltas, init) { (id, st) =>
      states :+= (id, st)
    }
    // batch 1: connect the pairs strongly
    stream.addData((1L, 2L, 5.0))
    q.processAllAvailable()
    // batch 2: delete the link again
    stream.addData((1L, 2L, -5.0))
    q.processAllAvailable()
    q.stop()

    assert(states.size == 2)
    val afterInsert = canonicalPartition(toMapLL(
      states(0)._2.assign.select(col("v"), col("community"))))
    assert(afterInsert(1L) == afterInsert(2L), s"insert: $afterInsert")
    val afterDelete = canonicalPartition(toMapLL(
      states(1)._2.assign.select(col("v"), col("community"))))
    assert(afterDelete == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L),
      s"delete: $afterDelete")
    // the deleted edge is gone from the live graph
    assert(states(1)._2.canon
      .where(col("src") === 1 && col("dst") === 2).count() == 0)
  }

  test("edgeRates: watermarked windowed counts over the delta feed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, Long, Double)]
    val deltas = stream.toDF().toDF("ts", "src", "dst", "weight")
    val rates = StreamingUpdates.edgeRates(deltas, "1 minute", "2 minutes")
    val q = rates.writeStream.outputMode("update")
      .format("memory").queryName("rates").start()
    val t0 = Timestamp.valueOf("2026-01-01 00:00:10")
    val t1 = Timestamp.valueOf("2026-01-01 00:00:40")
    stream.addData((t0, 1L, 2L, 1.0), (t1, 2L, 3L, -1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT edges, inserts, deletes FROM rates").collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 2 && rows(0).getLong(1) == 1 &&
      rows(0).getLong(2) == 1)
  }
}
