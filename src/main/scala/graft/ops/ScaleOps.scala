package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale techniques the 100 TB design leans on, as oracle-checked catalog
  * entries: bucketed co-located joins (shuffle moved offline into the
  * layout — the Spark analogue of the reference pre-partitioning its LMDB
  * index by cell so queries never reshuffle, `lopq/lopq/search.py:445-499`),
  * salting for skewed join keys (the reference's updates are heavily skewed
  * toward the newest day — `searcher_lopqhbase.py:632-653` scans them in
  * suffix order), and sketch-based distinct counting for ingest statistics
  * (`ingester/kafka_ingester.py:117-171` counters, SURVEY §2.4's
  * approx_count_distinct mapping).
  */
object ScaleOps {
  import Tables.{apply => t}

  private def sfName(d: String): String = new java.io.File(d).getName

  /** Skew-safe equi-join: replicate the (small) `dim` side `saltBuckets`
    * times and split each fact key's rows across the replicas, so one hot
    * key spreads over `saltBuckets` shuffle partitions instead of one.
    * Salt is derived from the fact row content (deterministic, no rand()),
    * so replays produce identical assignments. Result is exactly
    * `fact JOIN dim USING (key)`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("graft_salt",
      pmod(hash(struct(fact.columns.map(col).toSeq: _*)), lit(saltBuckets)))
    val saltedDim = dim.withColumn("graft_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.hint("merge")
      .join(saltedDim, Seq(key, "graft_salt"))
      .drop("graft_salt")
  }

  val defs: Seq[QueryDef] = Seq(
    // Bucketed co-located join: both sides written bucketBy(join key) with
    // the same bucket count, then sort-merge-joined WITHOUT a shuffle —
    // the Exchange happens once at layout time, not per query (PlanSpec
    // pins the no-Exchange property). At 100 TB this is the difference
    // between re-shuffling the fact table on every join and never
    // shuffling it at all.
    QueryDef(
      "q57_bucketed_join",
      (s, d) => {
        val suffix = sfName(d).replace('.', '_')
        val ot = s"graft_orders_bkt_$suffix"
        val ct = s"graft_cust_bkt_$suffix"
        // idempotent across sessions: the in-memory catalog forgets the
        // table on restart but its warehouse directory survives, and
        // Overwrite can't claim an orphaned location
        Seq(ot, ct).foreach { tbl =>
          s.sql(s"DROP TABLE IF EXISTS $tbl")
          val loc = new org.apache.hadoop.fs.Path(
            java.net.URI.create(s"${s.conf.get("spark.sql.warehouse.dir")}/$tbl"))
          val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(loc)) fs.delete(loc, true)
        }
        t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
          .write.mode(SaveMode.Overwrite)
          .bucketBy(16, "o_custkey").sortBy("o_custkey")
          .saveAsTable(ot)
        t(s, d, "customer").select("c_custkey", "c_mktsegment")
          .write.mode(SaveMode.Overwrite)
          .bucketBy(16, "c_custkey").sortBy("c_custkey")
          .saveAsTable(ct)
        s.table(ot).hint("merge")
          .join(s.table(ct), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("total"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |       round(sum(o_totalprice), 2) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Salted skewed join: 75% of fact rows share one hot key; the salted
    // plan splits that key across 8 shuffle partitions and must produce
    // exactly the plain-join result (the oracle). AQE's skew handling
    // covers sort-merge spills at runtime; explicit salting is the static
    // fix that also works for aggregations and older engines.
    QueryDef(
      "q58_salted_join",
      (s, d) => {
        val fact = t(s, d, "lineitem")
          .select(when(col("l_orderkey") % 4 < 3, lit(0L))
            .otherwise(col("l_orderkey") % 50).as("k"),
            col("l_quantity"))
        val dim = t(s, d, "supplier")
          .groupBy((col("s_suppkey") % 50).as("k"))
          .agg(min("s_name").as("dim_name"))
        saltedJoin(fact, dim, "k", saltBuckets = 8)
          .groupBy("dim_name")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
          .orderBy("dim_name")
      },
      Some("""WITH fact AS (
             |  SELECT CASE WHEN l_orderkey % 4 < 3 THEN 0
             |              ELSE l_orderkey % 50 END AS k, l_quantity
             |  FROM lineitem),
             |dim AS (SELECT s_suppkey % 50 AS k, min(s_name) AS dim_name
             |        FROM supplier GROUP BY 1)
             |SELECT dim_name, count(*) AS n, round(sum(l_quantity), 2) AS qty
             |FROM fact JOIN dim USING (k)
             |GROUP BY dim_name ORDER BY dim_name""".stripMargin)),

    // Sketch-based distinct counting: at 100 TB exact countDistinct
    // shuffles every distinct key; approx_count_distinct (HLL++) keeps a
    // constant-size sketch per group. The oracle checks the exact count
    // and that the sketch landed within its error envelope.
    QueryDef(
      "q59_approx_distinct",
      (s, d) =>
        t(s, d, "events")
          .groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("exact_users"),
            approx_count_distinct(col("user_id"), 0.02).as("approx"))
          .select(col("event_type"), col("exact_users"),
            (abs(col("approx") - col("exact_users"))
              <= col("exact_users") * 0.05).as("within_5pct"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             |       true AS within_5pct
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Percentile aggregation for distribution statistics (quality-score /
    // value monitoring in an ingest pipeline). Exact `percentile` here —
    // both engines implement the same linear-interpolation definition, so
    // the oracle is an exact hash match; at 100 TB the same query swaps in
    // approx_percentile (t-digest sketch, constant memory) the way q59
    // swaps exact distinct for HLL.
    QueryDef(
      "q61_percentile",
      (s, d) =>
        t(s, d, "events")
          .groupBy("event_type")
          .agg(
            round(expr("percentile(value, 0.5)"), 4).as("p50"),
            round(expr("percentile(value, 0.95)"), 4).as("p95"),
            round(expr("percentile(value, 0.99)"), 4).as("p99"))
          .orderBy("event_type"),
      Some("""SELECT event_type,
             |       round(quantile_cont(value, 0.5), 4) AS p50,
             |       round(quantile_cont(value, 0.95), 4) AS p95,
             |       round(quantile_cont(value, 0.99), 4) AS p99
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Bloom-pruned semi join — the explicit form of Spark's runtime
    // filtering (InjectRuntimeFilter): when the dimension side is too big
    // to broadcast but its KEY SET fits a bloom sketch, build the bloom
    // once over the dim keys, prune the fact scan BEFORE the join
    // shuffle, and let the exact join remove the false positives — so the
    // result is bit-identical to the plain semi join (the oracle) while
    // the shuffle carries only ~matching rows. At 100 TB this is the
    // difference between shuffling the whole fact table and shuffling the
    // selectivity-fraction of it; the sketch itself is O(numBits) —
    // 128 KB here — independent of either table's size.
    QueryDef(
      "q82_bloom_join",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val dimKeys = t(s, d, "orders")
          .where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        // one pass over the dim keys -> a driver-held 128 KB sketch
        val bloom = dimKeys
          .select(call_function("graft_bloom_agg",
            xxhash64(col("o_orderkey")), lit(200000L), lit(1048576L)).as("bf"))
          .head.getAs[Array[Byte]](0)
        val fact = t(s, d, "lineitem")
          .select("l_orderkey", "l_returnflag", "l_quantity")
        val pruned = fact.where(call_function("graft_bloom_contains",
          lit(bloom), xxhash64(col("l_orderkey"))))
        pruned
          .join(dimKeys.hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey"), "left_semi")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |       round(sum(l_quantity), 2) AS qty
             |FROM lineitem SEMI JOIN (
             |  SELECT o_orderkey FROM orders
             |  WHERE o_orderpriority = '1-URGENT') o
             |  ON l_orderkey = o_orderkey
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
  )
}
