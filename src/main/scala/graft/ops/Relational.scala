package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1–§2.7 relational operator inventory re-expressed as
  * declarative Spark plans over the TPC-H-ish test tables. Each query cites
  * the reference behavior it generalizes.
  *
  * Scale notes (100 TB): every query here is a single declarative plan —
  * filters/projections reach the parquet scan (pushdown + pruning), small
  * dimension sides are explicitly `broadcast()`, top-k goes through
  * `TakeOrderedAndProject` (no global sort materialization), and aggregations
  * are partial (map-side combine) by construction.
  */
object Relational {
  import Tables.{apply => t}

  val defs: Seq[QueryDef] = Seq(
    // §2.1 HBase range scan → pruned parquet scan with pushed key predicate
    // (ref scan_from_row, hbase_indexer_minimal.py:331-368)
    QueryDef(
      "q01_range_scan",
      (s, d) =>
        t(s, d, "lineitem")
          .where(col("l_orderkey") >= 100 && col("l_orderkey") < 600)
          .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem WHERE l_orderkey >= 100 AND l_orderkey < 600
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      bench = true),

    // §2.1 multi-get point lookups (ref get_rows_by_batch,
    // hbase_indexer_minimal.py:682-741) — an IN-list pushed to the scan
    QueryDef(
      "q02_point_lookup",
      (s, d) => {
        val keys = Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L, 89L, 144L, 233L, 377L, 610L, 987L)
        t(s, d, "orders")
          .where(col("o_orderkey").isin(keys: _*))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_str"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str
             |FROM orders
             |WHERE o_orderkey IN (1,2,3,5,8,13,21,34,55,89,144,233,377,610,987)
             |ORDER BY o_orderkey""".stripMargin)),

    // §2.3 lookup equi-join for result enrichment (ref
    // searcher_lopqhbase.py:916-947) — dims broadcast, fact side streams
    QueryDef(
      "q03_lookup_join",
      (s, d) =>
        t(s, d, "orders")
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .select(col("o_orderkey"), col("c_name"), col("n_name"), col("o_totalprice"))
          .orderBy("o_orderkey")
          .limit(100),
      Some("""SELECT o_orderkey, c_name, n_name, o_totalprice
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |            JOIN nation ON c_nationkey = n_nationkey
             |ORDER BY o_orderkey LIMIT 100""".stripMargin),
      bench = true),

    // §2.3 left-anti dedup-vs-DB join (ref ExtractionChecker
    // get_unprocessed_rows, extraction_checker.py:225-258)
    QueryDef(
      "q04_anti_join",
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders").where(col("o_totalprice") > 150000),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 150000)
             |ORDER BY c_custkey""".stripMargin),
      bench = true),

    // §2.4 grouped aggregation with partial (map-side) combine — the
    // covariance-accumulator pattern generalized (model.py:109-157)
    QueryDef(
      "q05_group_agg",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            count(lit(1)).as("cnt"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  count(*) AS cnt
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      bench = true),

    // §2.6 top-k without full sort → TakeOrderedAndProject
    // (ref sorted()[:limit], lopq/lopq/search.py:206-215)
    QueryDef(
      "q06_topk",
      (s, d) =>
        t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
            col("l_extendedprice"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(100),
      Some("""SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber, l_extendedprice
             |FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin),
      bench = true),

    // §2.5 ranking window — per-group top-3 (ref rerank re-ordering,
    // searcher_lopqhbase.py:900-912)
    QueryDef(
      "q07_window_rank",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .where(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),
      bench = true),

    // §2.7 set-based dedup (ref dropDuplicates pattern,
    // extraction_checker.py:312-316)
    QueryDef(
      "q08_distinct",
      (s, d) =>
        t(s, d, "orders")
          .select("o_orderstatus", "o_orderpriority")
          .distinct()
          .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // §2.4 cell histogram (ref lopq/eval.py:66-74)
    QueryDef(
      "q09_histogram",
      (s, d) =>
        t(s, d, "events")
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("user_id")).as("users"),
            round(sum("value"), 4).as("sum_value"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS cnt, count(DISTINCT user_id) AS users,
             |       round(sum(value), 4) AS sum_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      bench = true),

    // §2.2 missing-extraction filter = anti-join on the other direction
    // (ref get_missing_extr_updates_from_date, hbase_indexer_minimal.py:493-584)
    QueryDef(
      "q10_missing_anti",
      (s, d) =>
        t(s, d, "part")
          .join(t(s, d, "lineitem").where(col("l_quantity") >= 48),
            col("p_partkey") === col("l_partkey"), "left_anti")
          .select(col("p_partkey"), col("p_name"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem
             |                  WHERE l_partkey = p_partkey AND l_quantity >= 48)
             |ORDER BY p_partkey""".stripMargin)),

    // §2.3 brute-force NN oracle = cross join + per-row top-1
    // (ref lopq/eval.py:7-38 full pairwise cdist). Physical shape: the
    // argmin over (dist, c_custkey) is PACKED INTO ONE BIGINT —
    // `dist_cents << 32 | c_custkey` (acctbal is exact 2-decimal money, so
    // cents are exact integers ≤ 2²¹; custkey < 2³¹ — 53 bits total, no
    // collisions) — so the per-pair loop and the per-group min are
    // whole-stage-codegen'd primitive long ops with map-side partial
    // combine (only |S| groups shuffle). A min-of-struct agg here was
    // measured 100×+ slower: every one of the |S|·|C| pairs paid an
    // interpreted row allocation + recursive comparison. The supplier side
    // is spread across cores first: the test table is one parquet file
    // (single row-group → single input split), which would otherwise put
    // the whole O(|S|·|C|) loop on one core — at 100 TB the fact side
    // arrives in thousands of splits and this repartition disappears.
    QueryDef(
      "q11_cross_top1",
      (s, d) => {
        val sup = t(s, d, "supplier")
          .select(col("s_suppkey"), round(col("s_acctbal") * 100).cast("long").as("s_cents"))
          .repartition(col("s_suppkey"))
        val cust = t(s, d, "customer")
          .select(col("c_custkey"), round(col("c_acctbal") * 100).cast("long").as("c_cents"))
        val packed = abs(col("s_cents") - col("c_cents")) * lit(1L << 32) + col("c_custkey")
        sup.crossJoin(broadcast(cust))
          .groupBy("s_suppkey")
          .agg(min(packed).as("m"))
          .select(col("s_suppkey"),
            col("m").bitwiseAND(lit((1L << 32) - 1)).as("c_custkey"),
            round(shiftright(col("m"), 32).cast("double") / 100.0, 6).as("dist"))
          .orderBy("s_suppkey")
      },
      // oracle ranks in the SAME integer-cents space as the packed argmin:
      // ranking raw double differences diverges on near-ties (two customers
      // 0.059999... vs 0.06 apart collapse to the same 6 cents — first seen
      // at sf0.1, where 15k customers make such a collision likely)
      Some("""SELECT s_suppkey, c_custkey, round(dist_cents / 100.0, 6) AS dist FROM (
             |  SELECT s_suppkey, c_custkey,
             |    abs(round(s_acctbal * 100)::BIGINT - round(c_acctbal * 100)::BIGINT) AS dist_cents,
             |    row_number() OVER (PARTITION BY s_suppkey
             |                       ORDER BY abs(round(s_acctbal * 100)::BIGINT - round(c_acctbal * 100)::BIGINT),
             |                                c_custkey) AS rn
             |  FROM supplier CROSS JOIN customer)
             |WHERE rn = 1 ORDER BY s_suppkey""".stripMargin),
      bench = true),

    // §2.1 positional explode (ref CDR obj_pos alignment,
    // kafka_image_downloader.py:53-63)
    QueryDef(
      "q12_posexplode",
      (s, d) =>
        t(s, d, "documents")
          .where(col("doc_id") < 50)
          .select(col("doc_id"),
            posexplode(graft.functions.TextFunctions.tokens(col("text"))))
          .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("tok"))
          .orderBy("doc_id", "pos"),
      Some("""SELECT doc_id, (generate_subscripts(toks, 1) - 1)::BIGINT AS pos,
             |       unnest(toks) AS tok
             |FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |      FROM documents WHERE doc_id < 50)
             |ORDER BY doc_id, pos""".stripMargin)),

    // §2.7 set difference (ref extraction_checker.py:256)
    QueryDef(
      "q13_set_except",
      (s, d) => {
        val ev = t(s, d, "events")
        val day1 = ev.where(col("ts") < lit("2024-01-02").cast("timestamp"))
          .select("user_id")
        val day2 = ev.where(col("ts") >= lit("2024-01-02").cast("timestamp")
          && col("ts") < lit("2024-01-03").cast("timestamp")).select("user_id")
        day1.except(day2).orderBy("user_id")
      },
      Some("""SELECT user_id FROM events WHERE ts < TIMESTAMP '2024-01-02'
             |EXCEPT
             |SELECT user_id FROM events
             |WHERE ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-03'
             |ORDER BY user_id""".stripMargin)),

    // §2.8 date parsing/formatting + temporal rollup
    // (ref update-id date math, hbase_indexer_minimal.py:587-593)
    QueryDef(
      "q14_date_agg",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
          .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("sum_price"))
          .orderBy("order_year"),
      Some("""SELECT year(o_orderdate)::BIGINT AS order_year, count(*) AS cnt,
             |       round(sum(o_totalprice), 2) AS sum_price
             |FROM orders GROUP BY 1 ORDER BY order_year""".stripMargin)),

    // §2.3 semi join — "has at least one qualifying row" filter, the dual
    // of q04's anti join (ref processed-flag re-checks,
    // extraction_processor.py:247-262)
    QueryDef(
      "q15_semi_join",
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders").where(col("o_totalprice") > 250000),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 250000)
             |ORDER BY c_custkey""".stripMargin)),

    // Gap-based sessionization over the event stream — the training-data-
    // pipeline twin of the reference's update batching (flush after
    // max_delay gap, extraction_checker.py:341-386): lag() to detect
    // >30-min silences, running sum to number sessions, then per-session
    // rollup. All event-time, µs-precision integers on both engines.
    QueryDef(
      "q18_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val prevTs = lag(unix_micros(col("ts")), 1).over(byUser)
        val gapUs = lit(30L * 60 * 1000000)
        t(s, d, "events")
          .withColumn("new_sess",
            when(prevTs.isNull || (unix_micros(col("ts")) - prevTs) > gapUs, 1L).otherwise(0L))
          .withColumn("session_id", sum("new_sess").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            ((max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))) / lit(1000000L))
              .cast("long").as("duration_sec"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH flagged AS (
             |  SELECT user_id, ts, epoch_us(ts) AS us,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30*60*1000000
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, ts, us,
             |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             |                        ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM flagged)
             |SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
             |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             |       ((max(us) - min(us)) // 1000000)::BIGINT AS duration_sec
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // As-of join: each click matched to the user's most recent purchase at
    // or before it — running last_value(… IGNORE NULLS) over event time, no
    // self-join, no shuffle beyond the one partitioning by user
    // (ref positional repair joins, searcher_lopqhbase.py:916-947,
    // generalized to temporal alignment)
    QueryDef(
      "q19_asof_join",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val lastPurchase =
          last(when(col("event_type") === "purchase", unix_micros(col("ts"))), ignoreNulls = true)
            .over(w)
        t(s, d, "events")
          .withColumn("purch_us", lastPurchase)
          .where(col("event_type") === "click")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("click_us"),
            col("purch_us"),
            ((unix_micros(col("ts")) - col("purch_us")) / lit(1000000L)).cast("long")
              .as("secs_since_purchase"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, click_us, purch_us,
             |       ((click_us - purch_us) // 1000000)::BIGINT AS secs_since_purchase
             |FROM (
             |  SELECT event_id, user_id, event_type, epoch_us(ts) AS click_us,
             |    last_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS UNBOUNDED PRECEDING) AS purch_us
             |  FROM events)
             |WHERE event_type = 'click' ORDER BY event_id""".stripMargin)),

    // §2.3 rerank join: approximate top-N by one metric, exact re-score of
    // the prefix, re-sort (ref searcher_lopqhbase.py:862-912)
    QueryDef(
      "q16_rerank_join",
      (s, d) => {
        val top200 = t(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(200)
        top200
          .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
          .withColumn("exact_score", round(col("p_retailprice") * col("l_quantity"), 4))
          .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
            col("exact_score"))
          .orderBy(col("exact_score").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(100)
      },
      Some("""SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
             |       round(p_retailprice * l_quantity, 4) AS exact_score
             |FROM (SELECT * FROM lineitem
             |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 200)
             |JOIN part ON l_partkey = p_partkey
             |ORDER BY exact_score DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin),
      bench = true),

    // §2.9 micro-batch/window semantics, batch analog: tumbling 1h windows
    // (ref update batching, extraction_checker.py:281-344)
    QueryDef(
      "q17_tumbling_window",
      (s, d) =>
        t(s, d, "events")
          .groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_str"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value"))
          .orderBy("hour_str", "event_type"),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_str,
             |       event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY hour_str, event_type""".stripMargin),
      bench = true),

    // §2.4 hierarchical subtotal aggregation — ROLLUP over (day, type):
    // the daily/overall operational report shape (per-type per-day, per-day
    // subtotal, grand total) in ONE aggregation pass instead of three
    // unioned scans. Subtotal rows surface as 'ALL' sentinels so the
    // output is NULL-free on both engines. Scale: Spark expands the
    // grouping sets map-side and partially aggregates each — still one
    // shuffle, map-side combinable, no extra scans.
    QueryDef(
      "q92_rollup_report",
      (s, d) =>
        t(s, d, "events")
          .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
          .rollup("day", "event_type")
          .agg(count(lit(1)).cast("long").as("cnt"),
            round(sum("value"), 4).as("sum_value"))
          .select(coalesce(col("day"), lit("ALL")).as("day"),
            coalesce(col("event_type"), lit("ALL")).as("event_type"),
            col("cnt"), col("sum_value"))
          .orderBy("day", "event_type"),
      Some("""SELECT coalesce(strftime(ts, '%Y-%m-%d'), 'ALL') AS day,
             |       coalesce(event_type, 'ALL') AS event_type,
             |       count(*) AS cnt, round(sum(value), 4) AS sum_value
             |FROM events GROUP BY ROLLUP(strftime(ts, '%Y-%m-%d'), event_type)
             |ORDER BY day, event_type""".stripMargin))
  )
}
