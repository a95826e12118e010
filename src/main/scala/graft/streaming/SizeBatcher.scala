package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One ingest event entering the batcher. `shard` is the parallelism key
  * (the reference runs one checker per extraction type; here any hash of the
  * input keys works), `eventId` the unique record id, `ts` event time. A row
  * with `eventId == SizeBatcher.FlushSentinel` is a punctuation message:
  * flush the shard's pending batch immediately. */
case class IngestEvent(shard: Long, eventId: Long, ts: Timestamp)

/** Per-shard batcher state: the pending (tsMs, eventId) buffer and the next
  * update index to assign. Kept as two parallel Seqs for a cheap flat
  * encoder. */
case class PendingBatch(tsMs: Seq[Long], ids: Seq[Long], nextIdx: Long)

/** One emitted "update": a closed micro-batch of events, ready to be
  * claimed by an extraction worker. */
case class UpdateBatch(shard: Long, updateIdx: Long, nItems: Long,
    firstEventId: Long, lastEventId: Long, isFinal: Boolean)

/** The reference's update builder as a Structured Streaming stateful
  * operator: accumulate per-shard events until `batch_update_size` is
  * reached OR the flush delay elapses, then emit one "update"
  * (ref `updater/extraction_checker.py:281-344` — accumulate until
  * `HBI_batch_update_size` (1000 default / 2048 release) or
  * `max_delay` = 600 s since the batch started, then push the update;
  * constants at `extraction_checker.py:22-24`).
  *
  * Spark-first shape: `groupByKey(shard).flatMapGroupsWithState` — state is
  * partition-local (keyed exactly like the shuffle), so the operator scales
  * to any executor count with no coordination; the state store checkpoints
  * it for exactly-once resume (the reference re-reads HBase to recover).
  *
  * Two flush paths, both emitted with `isFinal = true`:
  *   - event-time timeout: when the watermark passes
  *     `last pending ts + flushDelayMs`, the leftover batch is emitted and
  *     the state dropped — the streaming analogue of the checker's
  *     "600 s since first unpushed message" timer;
  *   - sentinel punctuation: an `eventId == FlushSentinel` row flushes the
  *     shard synchronously — used by finite replays (drain-and-compare) and
  *     graceful shutdown, where no later watermark will ever arrive.
  *
  * `maxSpanMs`, when set, additionally closes a batch early as soon as the
  * next event would stretch it past that event-time span — the checker's
  * behavior of never letting an update cover more than `max_delay` of
  * wall-clock accumulation, translated to event time.
  */
object SizeBatcher {
  val FlushSentinel: Long = Long.MinValue

  /** `events` must carry a watermark on `ts` (set `withWatermark` before
    * calling) — the timeout flush rides it. */
  def updates(events: Dataset[IngestEvent], batchSize: Int, flushDelayMs: Long,
      maxSpanMs: Option[Long] = None): Dataset[UpdateBatch] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.shard)
      .flatMapGroupsWithState[PendingBatch, UpdateBatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (shard: Long, rows: Iterator[IngestEvent], state: GroupState[PendingBatch]) =>
          def mk(idx: Long, chunk: Vector[(Long, Long)], fin: Boolean) =
            UpdateBatch(shard, idx, chunk.size.toLong,
              chunk.map(_._2).min, chunk.map(_._2).max, fin)

          if (state.hasTimedOut) {
            // watermark passed the pending batch's flush deadline
            val st = state.get
            state.remove()
            if (st.ids.nonEmpty)
              Iterator.single(mk(st.nextIdx,
                st.tsMs.zip(st.ids).toVector.sorted, fin = true))
            else Iterator.empty
          } else {
            val st = state.getOption.getOrElse(PendingBatch(Nil, Nil, 0L))
            val incoming = rows.toVector
            val flushNow = incoming.exists(_.eventId == FlushSentinel)
            // merge pending + new, totally ordered by (ts, id): within one
            // invocation the chunking is then independent of arrival order
            val all = (st.tsMs.zip(st.ids) ++
              incoming.withFilter(_.eventId != FlushSentinel)
                .map(e => (e.ts.getTime, e.eventId))).toVector.sorted

            val out = Vector.newBuilder[UpdateBatch]
            var idx = st.nextIdx
            var cur = Vector.empty[(Long, Long)]
            for (row <- all) {
              if (cur.nonEmpty && maxSpanMs.exists(s => row._1 - cur.head._1 > s)) {
                out += mk(idx, cur, fin = false); idx += 1; cur = Vector.empty
              }
              cur = cur :+ row
              if (cur.size >= batchSize) {
                out += mk(idx, cur, fin = false); idx += 1; cur = Vector.empty
              }
            }
            if (flushNow && cur.nonEmpty) {
              out += mk(idx, cur, fin = true); idx += 1; cur = Vector.empty
            }

            if (cur.isEmpty && st.nextIdx == 0L && idx == 0L) {
              // nothing buffered and nothing ever emitted — no state to keep
              state.remove()
            } else {
              state.update(PendingBatch(cur.map(_._1), cur.map(_._2), idx))
              if (cur.nonEmpty) {
                // flush deadline: delay past the newest pending event, but
                // always strictly ahead of the current watermark (Spark
                // rejects a timeout at-or-before it)
                val deadline = math.max(cur.map(_._1).max + flushDelayMs,
                  state.getCurrentWatermarkMs() + 1L)
                state.setTimeoutTimestamp(deadline)
              }
            }
            out.result().iterator
          }
      }
  }
}
