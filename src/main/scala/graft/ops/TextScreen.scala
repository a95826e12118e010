package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** INCREMENTAL / SCREENED TEXT DEDUP (VERDICT r14 "what's missing #1") —
  * the text twin of the embedding side's q97/q98 loop and of the
  * reference's actual production shape: its only dedup mode is checking
  * NEW content against what is already indexed
  * (ref `updater/extraction_checker.py:225-258`), never re-sweeping the
  * corpus. At 100 TB nobody re-bands the corpus nightly; the MinHash
  * signature/band table is an INDEX ARTIFACT maintained across batches
  * ([[TextSigStore]] — the codes-table discipline applied to text), and a
  * new batch is banded against it:
  *
  *   - candidates = (batch × corpus) ∪ (batch × batch) band collisions
  *     ONLY — corpus × corpus is never revisited;
  *   - the corpus contributes one SKINNY signature-table scan (the batch's
  *     band rows broadcast, so the scan is map-side, nothing corpus-sized
  *     shuffles) plus one candidate-pruned map-side pass of its TEXT for
  *     exact-jaccard verification (the same shape as the embedding
  *     screen's map-side-filtered vector pass);
  *   - batch rows drop by the same conservative-prefix rule as the
  *     embedding screen ([[VectorQueries.screenSurvivors]] — the rule is
  *     content-generic), survivors' signatures append to the store under
  *     a lexicographic watermark, and a replayed update id is inert.
  *
  * Work per batch is O(|batch| · collisions), never O(corpus²); the only
  * corpus-sized touches are the two map-side passes above.
  */
object TextSigStore {

  /** Store layout under `dir`:
    *   - `sigs/<updateId>/` — one delta directory per applied update
    *     (`(doc_id, sig)` rows, written with overwrite so a replayed
    *     partial attempt rewrites identical bytes);
    *   - `sigs/_base` (+ `_base_next` mid-promotion) — the compacted
    *     base ([[compact]] folds deltas in, `_SUCCESS`-gated exactly
    *     like [[IngestOps.compactVectors]]);
    *   - `tip` — the lexicographic update-id high-watermark (atomic
    *     write-temp + overwrite-rename, the codes store's discipline);
    *   - `meta` — the banding fingerprint (`numHashes`, `bands`) the
    *     store was built at: signatures are only comparable within one
    *     operating point, so a session screening at different LSH confs
    *     must fail fast, not silently under-recall. */
  private def sigsDir(dir: String) = s"$dir/sigs"
  private def basePath(dir: String) = s"${sigsDir(dir)}/_base"
  private def baseNextPath(dir: String) = s"${sigsDir(dir)}/_base_next"
  private def tipPath(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/tip")
  private def metaPath(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/meta")

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Seed the store: signatures of the indexed corpus at the session's
    * LSH operating point become `_base`; any prior store content at `dir`
    * (deltas, tip, meta) is replaced. The corpus passed here should be
    * the DEDUPED corpus a production loop maintains (q72's survivors) —
    * the screen stays correct either way, but an un-deduped corpus makes
    * every batch doc near a boilerplate clique collide with the whole
    * clique. */
  def build(spark: SparkSession, dir: String, corpus: DataFrame): Unit = {
    val p = TextOps.lshParams(spark)
    val fs = fsOf(spark, dir)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    TextOps.minhashSigsOf(corpus, p)
      .write.mode(SaveMode.Overwrite).parquet(basePath(dir))
    val out = fs.create(metaPath(dir), true)
    try out.write(s"${p.numHashes}\n${p.bands}\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** Fail fast when the session's LSH confs disagree with the operating
    * point the store was built at — band keys from different constants
    * never collide correctly, which would silently screen nothing. */
  private[graft] def requireParams(spark: SparkSession, dir: String,
      p: TextOps.LshParams): Unit = {
    val in = fsOf(spark, dir).open(metaPath(dir))
    val lines = try new String(in.readAllBytes(), "UTF-8").split("\n")
      finally in.close()
    require(lines(0).toInt == p.numHashes && lines(1).toInt == p.bands,
      s"text sig store at $dir was built at numHashes=${lines(0)} " +
        s"bands=${lines(1)}, session confs say ${p.numHashes}/${p.bands} — " +
        s"set ${TextOps.NumHashesConf}/${TextOps.BandsConf} to match or " +
        "rebuild the store")
  }

  /** Every stored signature row `(doc_id, sig)`: the compacted base
    * (preferring a committed `_base_next`) plus COMMITTED deltas — a
    * plain multi-root scan, no shuffle (the serve path). Only deltas at
    * or below the tip count: an orphaned delta from a crash between the
    * delta write and the tip advance is an UNAPPLIED update, and reading
    * it would poison the replay's own screen (the batch's ids would look
    * indexed, every batch doc would flag against itself, and the whole
    * batch would silently drop). A crash window mid-[[compact]] can only
    * leave bit-identical duplicate rows, which the next compaction's
    * dedup removes and the screen's band join tolerates. */
  def sigs(spark: SparkSession, dir: String): DataFrame = {
    val fs = fsOf(spark, dir)
    val roots = committedDeltaDirs(spark, dir).map(_.toString) ++
      baseToRead(fs, dir)
    require(roots.nonEmpty, s"no text sig store at $dir — run build first")
    spark.read.parquet(roots: _*)
  }

  private def deltaDirs(spark: SparkSession, dir: String)
      : Seq[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(sigsDir(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toIndexedSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_"))
      .map(_.getPath)
  }

  /** Delta dirs whose update id committed (≤ tip) — directory names ARE
    * update ids, so the watermark decides visibility exactly (one tip
    * read for the whole listing). */
  private def committedDeltaDirs(spark: SparkSession, dir: String)
      : Seq[org.apache.hadoop.fs.Path] = {
    val tip = readTip(spark, dir)
      .map(graft.engine.LopqIndexStore.normalizeUpdateId)
    deltaDirs(spark, dir).filter(p => tip.exists(t =>
      graft.engine.LopqIndexStore.normalizeUpdateId(p.getName) <= t))
  }

  private def nextComplete(fs: org.apache.hadoop.fs.FileSystem, dir: String) =
    fs.exists(new org.apache.hadoop.fs.Path(s"${baseNextPath(dir)}/_SUCCESS"))

  private def baseToRead(fs: org.apache.hadoop.fs.FileSystem, dir: String)
      : Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(basePath(dir))
    if (nextComplete(fs, dir)) Seq(baseNextPath(dir))
    else if (fs.exists(base)) Seq(base.toString)
    else Seq.empty
  }

  /** Watermark check — same contract as the codes store: update ids are
    * lexicographically monotone, anything at or below the tip is already
    * applied ([[graft.engine.LopqIndexStore.normalizeUpdateId]] keeps
    * mixed-width numeric suffixes comparable). */
  def isApplied(spark: SparkSession, dir: String, updateId: String): Boolean =
    readTip(spark, dir).exists(t =>
      graft.engine.LopqIndexStore.normalizeUpdateId(updateId) <=
        graft.engine.LopqIndexStore.normalizeUpdateId(t))

  private def readTip(spark: SparkSession, dir: String): Option[String] = {
    val fs = fsOf(spark, dir)
    if (!fs.exists(tipPath(dir))) None
    else {
      val in = fs.open(tipPath(dir))
      val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      Option(s.trim).filter(_.nonEmpty)
    }
  }

  /** Atomic write-temp + overwrite-rename (the codes store's tip
    * discipline) so a reader never sees a torn or missing tip. */
  private def writeTip(spark: SparkSession, dir: String, wm: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = fsOf(spark, dir)
    val p = fs.makeQualified(tipPath(dir))
    val tmp = fs.makeQualified(new org.apache.hadoop.fs.Path(s"$dir/.tip.tmp"))
    val out = fs.create(tmp, true)
    try out.write(wm.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    ()
  }

  /** Append one update's signature rows under its id. Commit order:
    * delta → tip. A crash between them leaves the update UNAPPLIED with
    * its delta readable — bit-identical rows the replay's overwrite
    * rewrites before advancing the tip (signatures are deterministic in
    * the text), so every crash window self-heals. Returns false (no
    * write) for an id at or below the watermark. */
  def appendSigs(spark: SparkSession, dir: String, sigRows: DataFrame,
      updateId: String): Boolean = {
    if (isApplied(spark, dir, updateId)) return false
    sigRows.write.mode(SaveMode.Overwrite)
      .parquet(s"${sigsDir(dir)}/$updateId")
    writeTip(spark, dir, updateId)
    true
  }

  /** Past this many un-folded delta directories, [[TextScreen
    * .screenAndAppend]] folds them into the base after the batch commits
    * (the LSM pressure valve — every screen re-lists O(updates-ever)
    * parquet roots otherwise). */
  val CompactSigsAtConf = "spark.graft.text.sigs.compactAt"
  val DefaultCompactSigsAt = 64

  /** Fold every COMMITTED delta (plus the current base) into one
    * compacted base — crash-safe, single-writer, every window
    * re-runnable; the exact [[IngestOps.compactVectors]] schedule
    * (finish-or-refold a leftover `_base_next`, write
    * dedup(base ∪ deltas), drop the folded deltas, promote). An
    * UNCOMMITTED orphan delta (crash before its tip advance) is left
    * alone: folding it would poison the base with rows whose update
    * never applied — its own replay overwrites it, or it lingers
    * harmlessly invisible to [[sigs]]. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val fs = fsOf(spark, dir)
    if (!fs.exists(new org.apache.hadoop.fs.Path(sigsDir(dir)))) return
    val next = new org.apache.hadoop.fs.Path(baseNextPath(dir))
    val base = new org.apache.hadoop.fs.Path(basePath(dir))
    def promote(): Unit = {
      if (fs.exists(base)) fs.delete(base, true)
      fs.rename(next, base)
      ()
    }
    if (fs.exists(next)) {
      if (nextComplete(fs, dir)) promote()
      else { fs.delete(next, true); () } // partial fold: refold from base+deltas
    }
    val deltas = committedDeltaDirs(spark, dir)
    if (deltas.isEmpty) return
    val srcs = deltas.map(_.toString) ++
      (if (fs.exists(base)) Seq(base.toString) else Seq.empty)
    spark.read.parquet(srcs: _*).dropDuplicates("doc_id")
      .write.mode(SaveMode.Overwrite).parquet(next.toString)
    deltas.foreach(p => fs.delete(p, true))
    promote()
  }

  /** Compact when the committed un-folded delta count reaches the conf
    * bound. */
  def maybeCompact(spark: SparkSession, dir: String): Unit = {
    val at = spark.conf
      .get(CompactSigsAtConf, DefaultCompactSigsAt.toString).toInt
    if (committedDeltaDirs(spark, dir).size >= at) compact(spark, dir)
  }
}

object TextScreen {
  import Tables.{apply => t}

  /** What one screened text-ingest cycle did (the [[IngestOps
    * .IngestReport]] shape): `applied=false` means the update id was at
    * or below the watermark — an at-least-once replay, nothing
    * recomputed. */
  final case class TextIngestReport(applied: Boolean, batchRows: Long,
      flaggedPairs: Long, appended: Long)

  /** Verified near-dup pairs `(id_a < id_b, jaccard)` between a NEW batch
    * and the indexed corpus, and within the batch itself — never
    * corpus × corpus (those pairs were settled when the corpus was
    * deduped and indexed).
    *
    * `corpus` carries `(doc_id, text)` for every id `corpusSigs` holds
    * (the content store the reference keeps in HBase — the text analogue
    * of the embedding screen's `corpusVectors` parameter); batch ids must
    * be disjoint from corpus ids and the batch must be BOUNDED (its band
    * rows broadcast — the same contract as the embedding screen's
    * touched-cell slice).
    *
    * Scale shape, in order: batch signatures/bands are one bounded scan;
    * the (batch × corpus) candidate join BROADCASTS the batch's band rows
    * so the corpus' skinny signature table streams through map-side
    * (nothing corpus-sized shuffles — past the byte gate it falls back to
    * the shuffle join, the cluster regime); verification recomputes
    * shingles on the candidate-pruned slices only (one map-side pass of
    * the corpus text, the lshPairsOf r14 discipline). */
  def screenPairs(corpus: DataFrame, corpusSigs: DataFrame,
      batch: DataFrame): DataFrame =
    screenImpl(corpus, corpusSigs, batch)._1

  private def screenImpl(corpus: DataFrame, corpusSigs: DataFrame,
      batch: DataFrame): (DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    val p = TextOps.lshParams(spark)
    val batchSigs = TextOps.minhashSigsOf(batch, p).localCheckpoint()
    val batchBands = TextOps.bandRowsOf(batchSigs, p).localCheckpoint()
    val corpusBands = TextOps.bandRowsOf(corpusSigs, p)
    // bounded-batch contract: band rows are |batch|·bands skinny rows
    // with a driver-known count, so the broadcast decision is exact
    // (same byte gate as the CC node map — ~(long, long-ish-string) rows)
    val bSide =
      if (batchBands.count() <= TextOps.ccBroadcastRowCap(spark))
        broadcast(batchBands) else batchBands
    val newOld = corpusBands.as("c")
      .join(bSide.as("b"),
        col("c.band") === col("b.band") && col("c.bsig") === col("b.bsig"))
      .select(least(col("c.doc_id"), col("b.doc_id")).as("id_a"),
        greatest(col("c.doc_id"), col("b.doc_id")).as("id_b"))
    val newNew = batchBands.as("a")
      .join(batchBands.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val cand = newOld.unionAll(newNew).distinct().localCheckpoint()
    val candIds = cand.select(col("id_a").as("doc_id"))
      .unionAll(cand.select(col("id_b").as("doc_id")))
      .distinct().localCheckpoint()
    // shingles of candidate docs only: corpus slice map-side-pruned
    // (ids disjoint, so the union has one row per candidate id)
    val sh = TextOps.shingleSliceOf(corpus, candIds)
      .unionAll(TextOps.shingleSliceOf(batch, candIds))
      .localCheckpoint()
    val j = TextFunctions.jaccard(col("sa"), col("sb"))
    val pairs = cand
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sa")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sb")), "id_b")
      .where(j >= p.threshold)
      .select(col("id_a"), col("id_b"), j.as("jaccard"))
    (pairs, batchSigs)
  }

  /** One screened text-ingest cycle against a [[TextSigStore]] at `dir`:
    * replay check (O(1) tip read), screen ([[screenPairs]] against the
    * persisted signatures), conservative-prefix drop
    * ([[VectorQueries.screenSurvivors]] — a batch doc whose text near-dups
    * any indexed doc or any smaller-id batch doc is dropped, whether or
    * not that smaller doc itself survives), then the SURVIVORS' signature
    * rows append under the update id. Commit order delta → tip: every
    * crash window self-heals on replay ([[TextSigStore.appendSigs]]).
    *
    * `corpus` must carry `(doc_id, text)` for every indexed id — base
    * corpus plus all prior batches' survivors (the caller owns the
    * content store; a replayed id is refused before any of it is read). */
  def screenAndAppend(spark: SparkSession, dir: String, corpus: DataFrame,
      batch: DataFrame, updateId: String): TextIngestReport = {
    if (TextSigStore.isApplied(spark, dir, updateId))
      return TextIngestReport(applied = false, 0L, 0L, 0L)
    val p = TextOps.lshParams(spark)
    TextSigStore.requireParams(spark, dir, p)
    val (pairs0, batchSigs) =
      screenImpl(corpus, TextSigStore.sigs(spark, dir), batch)
    val pairs = pairs0.localCheckpoint()
    val survivors = VectorQueries.screenSurvivors(batch, "doc_id", pairs)
      .select("doc_id").localCheckpoint()
    // survivors' sigs: slice the already-computed batch signatures (a
    // broadcast-sized semi-join), never a recompute
    val survSigs = batchSigs.join(survivors, "doc_id")
    val applied = TextSigStore.appendSigs(spark, dir, survSigs, updateId)
    if (applied) TextSigStore.maybeCompact(spark, dir)
    TextIngestReport(applied, batch.count(), pairs.count(), survivors.count())
  }

  // ------------------------------------------------------- catalog defs

  /** Corpus/batch split for the gates: ids ≢ 0 (mod 5) are the indexed
    * corpus, ids ≡ 0 are the arriving batch — both engines derive the
    * split identically. */
  private val BatchMod = 5

  private def split(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val all = t(s, d, "documents").repartition(col("doc_id"))
    (all.where(col("doc_id") % BatchMod =!= 0),
      all.where(col("doc_id") % BatchMod === 0))
  }

  val defs: Seq[QueryDef] = Seq(
    // INCREMENTAL screen PAIRS — which batch docs near-duplicate something
    // already indexed (or an earlier batch doc): band the batch against
    // the corpus signatures + itself, verify exact jaccard on the
    // candidate-pruned slice. Oracle: the full lshPairs chain restricted
    // to pairs with ≥ 1 batch side (banding collision is symmetric per
    // pair, so candidates-from-one-side equal candidates-from-self-join
    // restricted the same way).
    QueryDef(
      "q105_text_screen_pairs",
      (s, d) => {
        val (corpus, batch) = split(s, d)
        val corpusSigs = TextOps.minhashSigsOf(corpus, TextOps.lshParams(s))
        screenPairs(corpus, corpusSigs, batch)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH ${TextOps.lshCtePrefixForOracle}
              |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM pairs
              |WHERE id_a % $BatchMod = 0 OR id_b % $BatchMod = 0
              |ORDER BY id_a, id_b""".stripMargin),
      bench = true),

    // The FULL screened-ingest LOOP over the persisted store: seed with
    // the corpus signatures, screen the batch, append the survivors'
    // signatures under a watermarked update id, REPLAY the same id (must
    // be inert — the IngestSpec idempotence discipline, asserted inside
    // the query so the gate itself witnesses it), then emit the store's
    // final content. Oracle: signatures of corpus ∪ surviving batch, the
    // conservative-prefix rule in plain SQL (the q98 drops shape).
    QueryDef(
      "q106_text_screened_store",
      (s, d) => {
        val root = s"/root/repo/target/graft-text-store/${new java.io.File(d).getName}"
        val (corpus, batch) = split(s, d)
        TextSigStore.build(s, root, corpus)
        val r1 = screenAndAppend(s, root, corpus, batch, "u0001")
        val r2 = screenAndAppend(s, root, corpus, batch, "u0001")
        require(r1.applied && !r2.applied,
          s"screened text ingest replay must be inert: first=$r1 replay=$r2")
        TextSigStore.sigs(s, root)
          .select(col("doc_id"), concat_ws(",", col("sig")).as("sig_str"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${TextOps.lshCtePrefixForOracle},
              |drops AS (
              |  SELECT id_b AS id FROM pairs WHERE id_b % $BatchMod = 0
              |  UNION
              |  SELECT id_a FROM pairs
              |  WHERE id_a % $BatchMod = 0 AND id_b % $BatchMod <> 0)
              |SELECT doc_id, array_to_string(sig, ',') AS sig_str FROM sig
              |WHERE doc_id % $BatchMod <> 0
              |   OR doc_id NOT IN (SELECT id FROM drops)
              |ORDER BY doc_id""".stripMargin))
  )
}
