package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.engine.LopqIndexStore

/** Continuous maintenance of a persisted LOPQ index from a stream of
  * (id, vector) rows — SURVEY §2.9's mapping of the reference's index
  * refresh ("a streaming query continuously maintains the codes table;
  * 'refresh' becomes a no-op"; ref `api/api.py:307-384` refresh endpoint,
  * `searcher_lopqhbase.py:632-770` incremental `load_codes` since the
  * last-indexed update).
  *
  * Each micro-batch is appended through [[LopqIndexStore.appendUpdate]]
  * under a batch-id-derived update id, so the pipeline is idempotent twice
  * over: checkpoint recovery replays the same batch id (manifest refuses
  * it), and row-level overlap is suppressed by the id anti-join. Searchers
  * pick up appended cells on their next index load/refresh — no
  * stop-the-world rebuild, unlike the reference's "~2 minutes unresponsive"
  * full refresh (`searcher_lopqhbase.py:687`). */
object IndexMaintenance {

  /** Start the maintenance query. `source` must be a STREAMING DataFrame
    * carrying `idCol` and `vecCol`. `Trigger.AvailableNow()` drains finite
    * replays; pass a processing-time trigger for continuous ingest. */
  def maintain(spark: SparkSession, indexDir: String, source: DataFrame,
      idCol: String, vecCol: String, checkpoint: String,
      updatePrefix: String = "stream",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        // zero-padded across the FULL Long range so the watermark orders
        // lexically forever: at %06d a stream crossing 1M micro-batches
        // would roll over ("stream_1000000" < "stream_999999") and the
        // ≤-watermark replay check would refuse every append from then on
        LopqIndexStore.appendUpdate(spark, indexDir, df, idCol, vecCol,
          f"${updatePrefix}_$batchId%019d")
        ()
      }
      .trigger(trigger)
      .start()
}
