package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest-pipeline operators that complete the SURVEY §2 surface: the
  * detector/featurizer UDTF (q40), the local-directory binary source (q46),
  * API response shaping (q47), the dead-letter/repair batch (q48), the
  * batched upsert sink (q49), unprocessed/future-date filters (q51), and
  * update-id parsing (q52). Everything carries a DuckDB oracle.
  */
object PipelineOps {
  import Tables.{apply => t}

  /** DuckDB md5-hex-slice → BIGINT (1-based `from`). */
  private def hxs(e: String, from: Int, len: Int): String =
    s"('0x' || substr($e, $from, $len))::BIGINT"

  /** DuckDB mirror of the §2.10 stub detector/featurizer derivation over
    * `documents` payloads (`Extract.StubDetector`/`StubFeaturizer`) — the
    * CTE chain ends at `bf(doc_id, i, x0..y1, score, hf)`. Shared by q40
    * (the raw extraction rows) and q75 (the §3.1 search-by-image flow). */
  private def extractCtes: String =
    s"""h AS (SELECT doc_id, md5(text) AS h0 FROM documents),
       |d AS (SELECT doc_id, h0, 1 + (${hxs("h0", 1, 2)} % 3) AS n FROM h),
       |ei AS (SELECT doc_id, h0, i FROM d CROSS JOIN (VALUES (0),(1),(2)) t(i) WHERE i < n),
       |eb AS (SELECT doc_id, i, h0, md5(h0 || ':' || i) AS hi FROM ei),
       |bb AS (SELECT doc_id, i, h0,
       |  ${hxs("hi", 1, 4)} % 256 AS x0, ${hxs("hi", 5, 4)} % 256 AS y0,
       |  ${hxs("hi", 1, 4)} % 256 + 1 + ${hxs("hi", 9, 4)} % 128 AS x1,
       |  ${hxs("hi", 5, 4)} % 256 + 1 + ${hxs("hi", 13, 4)} % 128 AS y1,
       |  (${hxs("hi", 17, 4)} % 1001) / 1000.0 AS score
       |  FROM eb),
       |bf AS (SELECT *, md5(h0 || ':' || x0 || ',' || y0 || ',' || x1 || ',' || y1) AS hf FROM bb)""".stripMargin

  private def sfName(d: String): String = new java.io.File(d).getName

  private def deleteDir(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Latest-wins keyed upsert — the Spark shape of the reference's HBase
    * batched `put` sink (`hbase_indexer_minimal.py:621-680`: a put with an
    * existing row key overwrites) and of the per-cell duplicate-id
    * suppression on index insert (`lopq/lopq/search.py:340-364`). Union +
    * per-key max-version keep; at scale this is the standard
    * `foreachBatch`-MERGE pattern, shuffle-bounded by the key. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc)
    base.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Fixture for q46: materialize documents (doc_id < 100) as one UTF-8
    * text file each — the on-disk layout `LocalImagePusher` walks
    * (`pusher/local_images_pusher.py:59-70`). Idempotent per (sf, version). */
  private def ensureFiles(d: String): String = {
    val dir = java.nio.file.Paths.get(Tables.scratch(
      org.apache.spark.sql.SparkSession.active, s"graft-files/${sfName(d)}"))
    val marker = dir.resolve("_WRITTEN")
    if (!java.nio.file.Files.exists(marker)) {
      java.nio.file.Files.createDirectories(dir)
      val spark = org.apache.spark.sql.SparkSession.active
      t(spark, d, "documents").where(col("doc_id") < 100)
        .select("doc_id", "text").collect().foreach { r =>
          java.nio.file.Files.write(
            dir.resolve(f"doc_${r.getLong(0)}%05d.txt"),
            r.getString(1).getBytes("UTF-8"))
        }
      java.nio.file.Files.write(marker, Array.emptyByteArray)
    }
    dir.toString
  }

  val defs: Seq[QueryDef] = Seq(
    // §2.10 detector + featurizer UDTF: 1 image row → N detection rows via
    // Dataset.flatMap (ref generic_detector.py:10-183 detect_from_buffer,
    // generic_extractor.py:221-255 process_buffer, bbox→string compat
    // detector/utils.py:114-124). Stub math is md5-derived, mirrored by the
    // oracle; the traits/explode/schema are the real surface.
    QueryDef(
      "q40_detect",
      (s, d) => {
        import s.implicits._
        val ds = t(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
        Extract.extract(ds, Extract.StubDetector, Extract.StubFeaturizer)
          .select(col("doc_id"), col("det_idx"),
            col("left").as("x0"), col("top").as("y0"),
            col("right").as("x1"), col("bottom").as("y1"),
            round(col("score"), 6).as("score"),
            concat_ws(",", col("left"), col("top"), col("right"), col("bottom")).as("bbox_str"),
            round(element_at(col("feature"), 1), 6).as("f0"),
            round(element_at(col("feature"), 2), 6).as("f1"),
            round(element_at(col("feature"), 3), 6).as("f2"))
          .orderBy("doc_id", "det_idx")
      },
      Some(s"""WITH $extractCtes
              |SELECT doc_id, i::BIGINT AS det_idx, x0::BIGINT AS x0, y0::BIGINT AS y0,
              |  x1::BIGINT AS x1, y1::BIGINT AS y1, round(score, 6) AS score,
              |  (x0::VARCHAR || ',' || y0 || ',' || x1 || ',' || y1) AS bbox_str,
              |  round((${hxs("hf", 21, 4)} % 2001 - 1000) / 1000.0, 6) AS f0,
              |  round((${hxs("hf", 25, 4)} % 2001 - 1000) / 1000.0, 6) AS f1,
              |  round((${hxs("hf", 29, 4)} % 2001 - 1000) / 1000.0, 6) AS f2
              |FROM bf ORDER BY doc_id, det_idx""".stripMargin),
      bench = true),

    // §2.1 local-directory source: `binaryFile` scan with a path-glob
    // filter — the LocalImagePusher os.walk loop
    // (`pusher/local_images_pusher.py:59-70`, ext filter `:17-18`) as a
    // declarative source with pushed glob + (path, length, content) schema.
    QueryDef(
      "q46_binary_dir_source",
      (s, d) => {
        val dir = ensureFiles(d)
        s.read.format("binaryFile").option("pathGlobFilter", "*.txt").load(dir)
          .select(
            regexp_extract(col("path"), "([^/]+)$", 1).as("filename"),
            col("length"),
            sha2(col("content"), 256).as("sha256"))
          .orderBy("filename")
      },
      Some("""SELECT 'doc_' || lpad(doc_id::VARCHAR, 5, '0') || '.txt' AS filename,
             |       octet_length(text::BLOB)::BIGINT AS length,
             |       sha256(text) AS sha256
             |FROM documents WHERE doc_id < 100 ORDER BY filename""".stripMargin)),

    // §2.10 output formatter / API response shaping
    // (`searcher/output_mapping.py:78-230` + `api/api.py:145-189`): ranked
    // neighbor lists folded into one camelCase JSON document per query —
    // ordered arrays via sorted struct collect, distances in integer
    // micro-units so the JSON text is byte-identical across engines.
    QueryDef(
      "q47_api_response_shape",
      (s, d) => {
        val e = t(s, d, "embeddings").select("vec_id", "embedding")
        val q = e.where(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val dist = lit(1.0) - graft.functions.VectorFunctions.cosineSimilarity(col("q_vec"), col("embedding"))
        val w = Window.partitionBy("q_id").orderBy(col("dist"), col("vec_id"))
        val ranked = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
          .withColumn("dist", dist)
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
            floor(col("dist") * 1e6 + lit(0.5)).cast("long").as("micro"))
        ranked.groupBy("q_id")
          .agg(sort_array(collect_list(struct(col("rank"), col("n_id"), col("micro")))).as("arr"))
          .select(col("q_id"), to_json(struct(
            col("q_id").as("queryId"),
            transform(col("arr"), x => x.getField("n_id")).as("similarIds"),
            transform(col("arr"), x => x.getField("micro")).as("distancesMicro"))).as("response"))
          .orderBy("q_id")
      },
      Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
              |ranked AS (
              |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
              |    floor((1.0 - (list_dot_product(q.v, n.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))))) * 1e6 + 0.5)::BIGINT AS micro,
              |    row_number() OVER (PARTITION BY q.vec_id
              |      ORDER BY 1.0 - (list_dot_product(q.v, n.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v)))), n.vec_id) AS rank
              |  FROM e q JOIN e n ON q.vec_id < 5 AND n.vec_id <> q.vec_id
              |  QUALIFY rank <= 5),
              |agg AS (SELECT q_id, list(n_id ORDER BY rank) AS ids,
              |               list(micro ORDER BY rank) AS micros
              |        FROM ranked GROUP BY q_id)
              |SELECT q_id, to_json(struct_pack(queryId := q_id, similarIds := ids,
              |                                 distancesMicro := micros))::VARCHAR AS response
              |FROM agg ORDER BY q_id""".stripMargin)),

    // §2.9 failure handling / dead-letter + repair batch: deterministically
    // "failed" extractions land in a dead-letter set; the repair pass
    // re-finds updates with missing extractions and caps re-checks at 5
    // (ref `_failed` marking generic_extractor.py:211-219, re-queue scan
    // hbase_indexer_minimal.py:493-584, MAX_UP_CHECK_MISS_EXTR=5
    // extraction_processor.py:27).
    QueryDef(
      "q48_dead_letter_repair",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val failed = graft.functions.TextFunctions.md5Long(
          concat_ws(":", col("l_orderkey"), col("l_linenumber"))) % 17 === 0
        li.withColumn("is_failed", when(failed, 1L).otherwise(0L))
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_total"), sum("is_failed").as("n_failed"))
          .where(col("n_failed") >= 1)
          .select(col("l_orderkey"), col("n_total"), col("n_failed"),
            least(col("n_failed"), lit(5L)).as("check_count"))
          .orderBy("l_orderkey")
      },
      Some(s"""SELECT l_orderkey, count(*) AS n_total,
              |  sum(CASE WHEN ${hxs("md5(l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR)", 1, 15)} % 17 = 0
              |      THEN 1 ELSE 0 END)::BIGINT AS n_failed,
              |  least(sum(CASE WHEN ${hxs("md5(l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR)", 1, 15)} % 17 = 0
              |      THEN 1 ELSE 0 END), 5)::BIGINT AS check_count
              |FROM lineitem GROUP BY l_orderkey
              |HAVING n_failed >= 1 ORDER BY l_orderkey""".stripMargin)),

    // §2.1 HBase batched-put sink semantics: two successive keyed update
    // batches MERGEd latest-wins into a durable table (written + re-read —
    // a real sink round-trip), ref `push_dict_rows`
    // hbase_indexer_minimal.py:621-680 + dedup-on-insert search.py:340-364.
    QueryDef(
      "q49_upsert_sink",
      (s, d) => {
        val cust = t(s, d, "customer").select("c_custkey", "c_name", "c_acctbal")
        val base = cust.withColumn("version", lit(0L))
        val u1 = cust.where(col("c_custkey") % 10 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 1000)
          .withColumn("version", lit(1L))
        val u2 = cust.where(col("c_custkey") % 20 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 2000)
          .withColumn("version", lit(2L))
        val merged = upsert(upsert(base, u1, Seq("c_custkey"), "version"),
          u2, Seq("c_custkey"), "version")
        val out = Tables.scratch(s, s"graft-sink/${sfName(d)}/customer_upsert")
        merged.write.mode(SaveMode.Overwrite).parquet(out)
        s.read.parquet(out)
          .select(col("c_custkey"), col("c_name"),
            round(col("c_acctbal"), 2).as("acctbal"), col("version"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name,
             |  round(CASE WHEN c_custkey % 20 = 0 THEN c_acctbal + 2000
             |             WHEN c_custkey % 10 = 0 THEN c_acctbal + 1000
             |             ELSE c_acctbal END, 2) AS acctbal,
             |  (CASE WHEN c_custkey % 20 = 0 THEN 2
             |        WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END)::BIGINT AS version
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // §2.2 unprocessed filter (`processed IS NULL` after an outer join —
    // ref get_unprocessed_updates_from_date hbase_indexer_minimal.py:463-478)
    // + future-date skip filter (year-9999 sentinel rows never re-checked,
    // ref searcher_lopqhbase.py:573-598).
    QueryDef(
      "q51_unprocessed_filter",
      (s, d) => {
        val processed = t(s, d, "lineitem").where(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("o_orderkey")).distinct()
          .withColumn("processed_flag", lit(1))
        t(s, d, "orders")
          .join(processed, Seq("o_orderkey"), "left_outer")
          .withColumn("indexed_year",
            when(col("o_orderkey") % 97 === 0, lit(9999)).otherwise(year(col("o_orderdate"))))
          .where(col("processed_flag").isNull && col("indexed_year") =!= 9999)
          .select(col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_str"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str
             |FROM orders
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem
             |                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
             |  AND o_orderkey % 97 <> 0
             |ORDER BY o_orderkey""".stripMargin)),

    // §2.8 update-id suffix parsing (`'_'.join(row.split('_')[2:])`,
    // hbase_indexer_minimal.py:466-468,539 + searcher_lopqhbase.py:646-652):
    // build the reference's `index_update_<hash>_<date>` ids, then recover
    // the parts with substring_index/split and verify the round-trip.
    QueryDef(
      "q52_update_id_parse",
      (s, d) => {
        val uid = concat(lit("index_update_"),
          substring(md5(col("o_orderkey").cast("string")), 1, 8),
          lit("_"), date_format(col("o_orderdate"), "yyyy-MM-dd"))
        t(s, d, "orders")
          .where(col("o_orderkey") < 1000)
          .withColumn("update_id", uid)
          .select(col("o_orderkey"), col("update_id"),
            substring_index(col("update_id"), "_", 2).as("prefix"),
            element_at(split(col("update_id"), "_"), 3).as("content_hash"),
            substring_index(col("update_id"), "_", -1).as("update_date"))
          .withColumn("roundtrip_ok",
            concat_ws("_", col("prefix"), col("content_hash"), col("update_date"))
              === col("update_id"))
          .orderBy("o_orderkey")
      },
      Some("""WITH u AS (
             |  SELECT o_orderkey,
             |    'index_update_' || substr(md5(o_orderkey::VARCHAR), 1, 8)
             |      || '_' || strftime(o_orderdate, '%Y-%m-%d') AS update_id
             |  FROM orders WHERE o_orderkey < 1000),
             |p AS (SELECT o_orderkey, update_id, string_split(update_id, '_') AS parts FROM u)
             |SELECT o_orderkey, update_id,
             |       parts[1] || '_' || parts[2] AS prefix,
             |       parts[3] AS content_hash,
             |       parts[4] AS update_date,
             |       (parts[1] || '_' || parts[2] || '_' || parts[3] || '_' || parts[4] = update_id) AS roundtrip_ok
             |FROM p ORDER BY o_orderkey""".stripMargin)),

    // The §3.2 "INSERT" lifecycle end-to-end (image message → dedup → claim
    // → decode → update-batch assignment), on the typed ImageRecord schema:
    //   1. payloads → Dataset[ImageRecord] with content identity + decoded
    //      header (ref sha1-of-bytes imgio.py:23-39 — sha256 here, both
    //      engines expose it; header parse imgio.py:42-111 → decodeStub);
    //   2. in-batch dedup on the content hash (extraction_checker.py:312-316);
    //   3. claim-vs-processed anti-join (extraction_checker.py:225-258;
    //      "processed" = every 7th doc's hash, a deterministic stand-in for
    //      the images table);
    //   4. micro-batch update-id assignment in blocks of 200
    //      (batch_update_size, hbase_indexer_minimal.py:36), SHARD-KEYED:
    //      rank within 256 ordered shards (first sha1 hex byte) and lift to
    //      the global sha1 rank with per-shard prefix offsets — no global
    //      single-partition WindowExec (r4's one scale-killer). Update ids
    //      in the reference are per-checker, never a global sort
    //      (extraction_checker.py:185-223).
    QueryDef(
      "q53_ingest_pipeline",
      (s, d) => {
        import s.implicits._
        val ds = t(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
        val imgs = ds.map { case (id, payload) =>
          val (fmt, w, h) = MultimodalOps.decode(payload)
          val sha = java.security.MessageDigest.getInstance("SHA-256")
            .digest(payload).map("%02x".format(_)).mkString
          graft.core.Schemas.ImageRecord(sha, None, Some(s"doc://$id"), None,
            Some(fmt), Some(w), Some(h), Some(payload))
        }
        val processed = t(s, d, "documents").where(col("doc_id") % 7 === 0)
          .select(sha2(col("text").cast("binary"), 256).as("sha1"))
        // the micro-batch being ingested — materialized once (the shard
        // histogram below and the ranked output both read it; at 100 TB this
        // is the claimed-batch table a real ingest checkpoints anyway)
        val claimed = imgs.dropDuplicates("sha1")
          .join(processed, Seq("sha1"), "left_anti")
          .localCheckpoint()
        // 256 ordered, uniformly-loaded shards: shard = first hex byte of
        // the content hash. Each shard ranks locally (windows partitioned by
        // shard → a 256-way hash shuffle, never one partition); the global
        // rank is shard-local rank + the prefix sum of preceding shards'
        // counts. The histogram is O(shards) driver work independent of
        // corpus size, and rides back as a broadcast join.
        val w = Window.partitionBy("shard").orderBy("sha1")
        val sharded = claimed.withColumn("shard", substring(col("sha1"), 1, 2))
        val hist = sharded.groupBy("shard").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
        var acc = 0L
        val offsets = hist.map { case (sh, n) => val o = (sh, acc); acc += n; o }
        val offsetsDf = broadcast(offsets.toSeq.toDF("shard", "shard_offset"))
        sharded
          .withColumn("rn", row_number().over(w))
          .join(offsetsDf, "shard")
          .withColumn("update_id", format_string("index_update_%05d",
            ((col("shard_offset") + col("rn") - 1) / 200).cast("int")))
          .select(col("sha1"), col("update_id"), col("format"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"))
          .orderBy("sha1")
      },
      Some(s"""WITH img AS (
              |  SELECT DISTINCT sha256(text) AS sha1, md5(text) AS h FROM documents
              |  WHERE sha256(text) NOT IN
              |    (SELECT sha256(text) FROM documents WHERE doc_id % 7 = 0)),
              |rn AS (SELECT sha1, h, row_number() OVER (ORDER BY sha1) AS rn FROM img)
              |SELECT sha1,
              |  'index_update_' || lpad(((rn - 1) // 200)::VARCHAR, 5, '0') AS update_id,
              |  CASE ${hxs("h", 1, 2)} % 3 WHEN 0 THEN 'JPEG' WHEN 1 THEN 'PNG' ELSE 'GIF' END AS format,
              |  (32 * (1 + ${hxs("h", 3, 4)} % 64))::BIGINT AS width,
              |  (32 * (1 + ${hxs("h", 7, 4)} % 64))::BIGINT AS height
              |FROM rn ORDER BY sha1""".stripMargin),
      bench = true),

    // §3.1 FLAGSHIP FLOW through the API facade: search-by-image — payload
    // → detect → featurize → top-detection probe → ranked nearest corpus
    // detections (`/byURL`, ref api/api.py:145-189 + generic_extractor.py:
    // 221-255 + searcher_lopqhbase.py:838-912). The §2.10 stub math makes
    // the WHOLE pipeline — detection geometry, feature derivation, probe
    // selection, distance, ranking — reproducible in SQL, so the gate
    // hash-checks the composition end to end, not just the pieces.
    QueryDef(
      "q75_api_image_search",
      (s, d) => {
        val payloads = t(s, d, "documents").where(col("doc_id") < 3)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toSeq
          .sortBy(_._1)
        new graft.GraftApi(s, d).searchByImages(payloads, 5)
      },
      Some(s"""WITH $extractCtes,
              |feat AS (SELECT doc_id, i::BIGINT AS det_idx, score,
              |  round((${hxs("hf", 21, 4)} % 2001 - 1000) / 1000.0, 6) AS f0,
              |  round((${hxs("hf", 25, 4)} % 2001 - 1000) / 1000.0, 6) AS f1,
              |  round((${hxs("hf", 29, 4)} % 2001 - 1000) / 1000.0, 6) AS f2
              |  FROM bf),
              |q AS (SELECT doc_id AS q_id, f0 AS q0, f1 AS q1, f2 AS q2 FROM feat
              |      WHERE doc_id < 3
              |      QUALIFY row_number() OVER (PARTITION BY doc_id
              |        ORDER BY score DESC, det_idx) = 1),
              |pairs AS (SELECT q.q_id, n.doc_id AS n_id, n.det_idx AS n_det,
              |    (q.q0 - n.f0) * (q.q0 - n.f0) + (q.q1 - n.f1) * (q.q1 - n.f1)
              |      + (q.q2 - n.f2) * (q.q2 - n.f2) AS d2
              |  FROM q JOIN feat n ON n.doc_id <> q.q_id),
              |ranked AS (SELECT q_id, n_id, n_det, d2,
              |    row_number() OVER (PARTITION BY q_id
              |      ORDER BY d2, n_id, n_det)::BIGINT AS rank
              |  FROM pairs)
              |SELECT q_id, rank, n_id, n_det, floor(d2 * 1e6 + 0.5)::BIGINT AS micro
              |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin))
  )
}
