package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{IngestEvent, SizeBatcher, UpdateBatch}

/** The size-or-delay micro-batcher (ref extraction_checker.py:281-344) on a
  * controlled MemoryStream: size-triggered closes, the event-time-timeout
  * flush of a trailing partial batch, sentinel punctuation, and the
  * max-span early close. */
class SizeBatcherSpec extends SparkSpec {

  private def ev(shard: Long, id: Long, tsMs: Long) =
    IngestEvent(shard, id, new Timestamp(tsMs))

  private def run(batchSize: Int, flushDelayMs: Long, maxSpanMs: Option[Long])(
      feed: MemoryStream[IngestEvent] => Unit): Seq[UpdateBatch] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[IngestEvent]
    val src = mem.toDS().withWatermark("ts", "0 seconds").as[IngestEvent]
    val qn = s"sizebatch_spec_${System.nanoTime()}"
    val q = SizeBatcher.updates(src, batchSize, flushDelayMs, maxSpanMs)
      .toDF().writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try {
      feed(mem)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(qn).as[UpdateBatch].collect().toSeq
      .sortBy(u => (u.shard, u.updateIdx))
  }

  test("full batches close at batchSize; leftover flushes on event-time timeout") {
    val out = run(batchSize = 3, flushDelayMs = 2000L, maxSpanMs = None) { mem =>
      // shard 0: five events → one full batch of 3, two pending
      mem.addData((1 to 5).map(i => ev(0, 100 + i, 1000L * i)): _*)
      // later event on ANOTHER shard pushes the watermark past shard 0's
      // flush deadline (5000 + 2000); the no-data batch then fires the
      // timeout and emits the trailing partial as final
      mem.addData(ev(1, 900, 60000L))
    }
    val s0 = out.filter(_.shard == 0)
    assert(s0 === Seq(
      UpdateBatch(0, 0, 3, 101, 103, isFinal = false),
      UpdateBatch(0, 1, 2, 104, 105, isFinal = true)))
  }

  test("sentinel punctuation flushes pending state synchronously") {
    val out = run(batchSize = 10, flushDelayMs = 600000L, maxSpanMs = None) { mem =>
      mem.addData(ev(0, 1, 1000), ev(0, 2, 2000),
        ev(0, SizeBatcher.FlushSentinel, 3000))
    }
    assert(out === Seq(UpdateBatch(0, 0, 2, 1, 2, isFinal = true)))
  }

  test("maxSpan closes a batch before it covers more than the span") {
    val out = run(batchSize = 100, flushDelayMs = 600000L, maxSpanMs = Some(1000L)) { mem =>
      // not at epoch 0: a row whose ts equals the initial watermark would
      // be dropped as late before the stateful operator
      mem.addData(ev(0, 1, 10000), ev(0, 2, 10500), ev(0, 3, 11500), ev(0, 4, 11600),
        ev(0, SizeBatcher.FlushSentinel, 12000))
    }
    // [10000,10500] closes when 11500 would stretch the span past 1000 ms;
    // [11500,11600] is flushed by the sentinel
    assert(out === Seq(
      UpdateBatch(0, 0, 2, 1, 2, isFinal = false),
      UpdateBatch(0, 1, 2, 3, 4, isFinal = true)))
  }

  test("pending state and update counter survive a checkpointed restart") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = s"/root/repo/target/graft-stream/spec/resume_${System.nanoTime()}"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    val mem = MemoryStream[IngestEvent]
    def start() = SizeBatcher
      .updates(mem.toDS().withWatermark("ts", "0 seconds").as[IngestEvent],
        batchSize = 3, flushDelayMs = 600000L)
      .toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // phase 1: two events buffer in state, nothing emitted
    val q1 = start()
    mem.addData(ev(0, 1, 10000), ev(0, 2, 11000))
    q1.processAllAvailable(); q1.stop()

    // phase 2: restart from the checkpoint; the third event must complete
    // the SAME batch — possible only if the pending buffer was recovered
    mem.addData(ev(0, 3, 12000))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(out).as[UpdateBatch].collect().toSeq
    assert(got === Seq(UpdateBatch(0, 0, 3, 1, 3, isFinal = false)))
  }

  test("chunking is ordered by (ts, id), not arrival order") {
    val out = run(batchSize = 2, flushDelayMs = 600000L, maxSpanMs = None) { mem =>
      // arrival order deliberately scrambled within one micro-batch
      mem.addData(ev(0, 4, 4000), ev(0, 1, 1000), ev(0, 3, 3000), ev(0, 2, 2000))
    }
    assert(out === Seq(
      UpdateBatch(0, 0, 2, 1, 2, isFinal = false),
      UpdateBatch(0, 1, 2, 3, 4, isFinal = false)))
  }
}
