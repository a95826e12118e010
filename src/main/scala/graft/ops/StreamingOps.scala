package graft.ops

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface (SURVEY §2.9): the reference's ingest loop —
  * micro-batched consumption, in/cross-batch dedup, claim-vs-DB anti-join
  * (`updater/extraction_checker.py:260-459`) — re-expressed as streaming
  * queries over the events table used as a replayable source.
  *
  * Each query runs with `Trigger.AvailableNow` into a memory sink: the
  * stream drains the source completely and the result is a deterministic
  * DataFrame, so these entries carry REAL DuckDB oracles (the batch
  * equivalent must produce identical rows — the streaming/batch unification
  * guarantee Spark makes and the reference lacks).
  *
  * Scale: the same plans run unchanged against a Kafka source with a real
  * trigger; state (dedup keys, window partials) lives in the state store,
  * keyed exactly like the shuffle (user_id / window), so state is
  * partition-local at any executor count.
  */
object StreamingOps {
  import Tables.{apply => t}

  private val nameSeq = new AtomicInteger(0)

  val defs: Seq[QueryDef] = Seq(
    // §2.9 micro-batch tumbling-window aggregation as a STREAM (the
    // streaming twin of q17; ref update batching
    // extraction_checker.py:281-344): watermarked event-time windows,
    // complete-mode memory sink, AvailableNow drain.
    QueryDef(
      "q41_stream_tumbling",
      (s, d) => {
        val rawSchema = s.read.parquet(s"$d/events.parquet").schema
        val raw = s.readStream.schema(rawSchema).parquet(s"$d/events*.parquet")
        val ev = raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        val agg = ev
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_str"),
            col("event_type"), col("cnt"), col("sum_value"))
        val qn = s"graft_stream_tumbling_${nameSeq.incrementAndGet()}"
        val q = agg.writeStream.format("memory").queryName(qn)
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(qn).orderBy("hour_str", "event_type")
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_str,
             |       event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY hour_str, event_type""".stripMargin)),

    // §2.9 the ExtractionChecker ingest shape: stream → in-stream dedup
    // (dropDuplicates state) → anti-join against the static "already
    // processed" table → claimed keys (ref extraction_checker.py:225-316).
    QueryDef(
      "q42_stream_ingest_dedup",
      (s, d) => {
        val rawSchema = s.read.parquet(s"$d/events.parquet").schema
        val raw = s.readStream.schema(rawSchema).parquet(s"$d/events*.parquet")
        val processed = t(s, d, "customer")
          .where(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("user_id"))
        val claimed = raw
          .select(col("user_id"))
          .dropDuplicates("user_id")
          .join(processed, Seq("user_id"), "left_anti")
        val qn = s"graft_stream_dedup_${nameSeq.incrementAndGet()}"
        val q = claimed.writeStream.format("memory").queryName(qn)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(qn).orderBy("user_id")
      },
      Some("""SELECT DISTINCT user_id FROM events
             |WHERE NOT EXISTS (SELECT 1 FROM customer
             |                  WHERE c_custkey = user_id AND c_acctbal > 5000)
             |ORDER BY user_id""".stripMargin))
  )
}
