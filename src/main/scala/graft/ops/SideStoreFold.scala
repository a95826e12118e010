package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Tiered (minor/major) LSM folding shared by the two content side-stores
  * ([[TextSigStore]]'s signatures + survivor texts, [[IngestOps]]'s raw
  * vectors) — VERDICT r15 "what's missing #2".
  *
  * r15's single-level fold rewrote the ENTIRE base every `compactAt`
  * deltas (`dedup(base ∪ deltas)` → `_base`): the 8-batch magnitude probe
  * measured fold batches spiking 19-40 s → 88-92 s / 4.5 GB scratch
  * rewriting the ~3.5 GB texts base, and a long-lived store re-pays that
  * O(corpus) rewrite every `compactAt` batches FOREVER — at 100 TB the
  * maintenance bill dwarfs the ingest. The fix is HBase's own
  * minor-vs-major compaction split (the store these side-stores replace):
  *
  *   - MINOR fold (every `compactAt` deltas): deltas + the current
  *     delta-tier → one `_tier` directory. Cost O(tier + recent); the
  *     tier is bounded by the major trigger, so a fold batch never
  *     touches the base.
  *   - MAJOR fold (only when the tier's bytes RIVAL the base's —
  *     [[MajorRatioConf]], default tier ≥ base): `dedup(base ∪ tier)` →
  *     `_base`, tier removed. Geometric trigger ⇒ each row is rewritten
  *     O(log(corpus/batch)) times over the store's lifetime instead of
  *     once per `compactAt` batches.
  *
  * Both levels run the `_SUCCESS`-gated write-`<level>_next` /
  * delete-sources / promote schedule the r15 fold proved out, so the
  * crash-window story is unchanged in kind: a COMPLETE un-promoted
  * `_next` is preferred by readers (a superset of its level) and
  * promoted by the next fold; a PARTIAL `_next` is invisible and
  * discarded (promoting it would replace the level with a subset and
  * lose previously-folded rows for good — the IngestSpec rule); a crash
  * between source deletion steps leaves only bit-identical duplicate
  * rows, which every reader tolerates and the next fold's dedup removes.
  */
private[graft] object SideStoreFold {

  /** Major-fold trigger: rewrite the base when tier bytes ≥ ratio × base
    * bytes. 1.0 = HBase-style "tier rivals the base"; 0.0 forces a major
    * fold whenever a tier exists (the single-level r15 behavior, and the
    * spec's forcing lever). */
  val MajorRatioConf = "spark.graft.store.majorRatio"
  val DefaultMajorRatio = 1.0

  private def lvlPath(root: String, lvl: String) = new Path(s"$root/$lvl")
  private def nextPath(root: String, lvl: String) = new Path(s"$root/${lvl}_next")
  private def complete(fs: FileSystem, p: Path): Boolean =
    fs.exists(new Path(p, "_SUCCESS"))

  private def promote(fs: FileSystem, root: String, lvl: String): Unit = {
    val dst = lvlPath(root, lvl)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(nextPath(root, lvl), dst)
    ()
  }

  /** Finish (complete) or discard (partial) an interrupted promotion at
    * `lvl` — every fold entry point heals both levels first, so at most
    * one readable artifact per level survives into the fold's source
    * listing. */
  private def heal(fs: FileSystem, root: String, lvl: String): Unit = {
    val n = nextPath(root, lvl)
    if (fs.exists(n)) {
      if (complete(fs, n)) promote(fs, root, lvl)
      else { fs.delete(n, true); () }
    }
  }

  private def healAll(fs: FileSystem, root: String): Unit = {
    heal(fs, root, "_tier")
    heal(fs, root, "_base")
  }

  /** The level's readable root: a COMPLETE not-yet-promoted `_next`
    * (a superset of the level by construction) beats the level itself. */
  private def levelToRead(fs: FileSystem, root: String, lvl: String)
      : Seq[String] =
    if (complete(fs, nextPath(root, lvl))) Seq(nextPath(root, lvl).toString)
    else if (fs.exists(lvlPath(root, lvl))) Seq(lvlPath(root, lvl).toString)
    else Seq.empty

  /** Every compacted root a reader unions with the un-folded deltas:
    * base level plus delta-tier. */
  def storedRoots(fs: FileSystem, root: String): Seq[String] =
    levelToRead(fs, root, "_base") ++ levelToRead(fs, root, "_tier")

  private def foldInto(spark: SparkSession, srcs: Seq[String], dst: Path,
      key: String): Unit =
    spark.read.parquet(srcs: _*).dropDuplicates(key)
      .write.mode(SaveMode.Overwrite).parquet(dst.toString)

  /** MINOR fold: `deltas` (+ the current tier) → `_tier`. Never reads or
    * writes the base — O(tier + recent). */
  def minorFold(spark: SparkSession, fs: FileSystem, root: String,
      deltas: Seq[Path], key: String): Unit = {
    healAll(fs, root)
    if (deltas.isEmpty) return
    val srcs = deltas.map(_.toString) ++ levelToRead(fs, root, "_tier")
    foldInto(spark, srcs, nextPath(root, "_tier"), key)
    deltas.foreach(p => fs.delete(p, true))
    promote(fs, root, "_tier")
  }

  /** MAJOR fold, only when due: `dedup(base ∪ tier)` → `_base`, tier
    * removed. Due = tier bytes ≥ [[MajorRatioConf]] × base bytes (a
    * missing base counts 0 bytes, so the first tier majors immediately —
    * the store seeded without a base converges to the same layout). */
  def majorFoldIfDue(spark: SparkSession, fs: FileSystem, root: String,
      key: String): Unit = {
    healAll(fs, root)
    val tier = lvlPath(root, "_tier")
    if (!fs.exists(tier)) return
    val ratio = spark.conf
      .get(MajorRatioConf, DefaultMajorRatio.toString).toDouble
    val base = lvlPath(root, "_base")
    val baseBytes =
      if (fs.exists(base)) fs.getContentSummary(base).getLength else 0L
    if (fs.getContentSummary(tier).getLength < ratio * baseBytes) return
    val srcs = Seq(tier.toString) ++
      (if (fs.exists(base)) Seq(base.toString) else Seq.empty)
    foldInto(spark, srcs, nextPath(root, "_base"), key)
    fs.delete(tier, true)
    promote(fs, root, "_base")
  }

  /** FULL fold — the explicit `compact()` contract the specs pin:
    * everything (`deltas ∪ tier ∪ base`) → one `_base`, nothing else
    * left at `root` but the deltas the caller didn't pass. */
  def fullFold(spark: SparkSession, fs: FileSystem, root: String,
      deltas: Seq[Path], key: String): Unit = {
    healAll(fs, root)
    val tier = lvlPath(root, "_tier")
    val hasTier = fs.exists(tier)
    if (deltas.isEmpty && !hasTier) return
    val srcs = deltas.map(_.toString) ++
      (if (hasTier) Seq(tier.toString) else Seq.empty) ++
      levelToRead(fs, root, "_base")
    foldInto(spark, srcs, nextPath(root, "_base"), key)
    deltas.foreach(p => fs.delete(p, true))
    if (hasTier) fs.delete(tier, true)
    promote(fs, root, "_base")
  }
}
