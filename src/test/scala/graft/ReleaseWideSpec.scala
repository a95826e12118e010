package graft

import graft.engine.{RerankShape, ReleaseShape}

/** Release-WIDTH rerank pins (VERDICT r6 next-round #3): against the staged
  * 2M × 2048-d (~16 GB) feature table, the auto-selected rerank shape must
  * be the pushed-IN lookup, and its executed scan must read a pruned
  * fraction of the table — per-id point lookups (ref
  * `searcher_lopqhbase.py:862-912`), never a streaming scan. Skips when the
  * table is not staged (`runMain graft.BuildRelease wide`, once). */
class ReleaseWideSpec extends SparkSpec {

  private def staged = ReleaseShape.wideStaged(spark)

  test("Auto resolves to the lookup shape at release width") {
    assume(staged, "wide table not staged")
    assert(RerankShape.useLookup(ReleaseShape.wideVectors(spark), RerankShape.Auto),
      "a 16 GB table must select the pushed-IN lookup")
  }

  test("the wide rerank scan is pruned to a fraction of files and rows") {
    assume(staged, "wide table not staged")
    graft.functions.GraftFunctions.register(spark)
    val df = ReleaseShape.rerankWide(spark, queryId = 997L)
    val rows = df.collect()
    assert(rows.length === ReleaseShape.TopK)
    // exact distances are over the full 2048-d width and strictly ordered
    assert(rows.map(_.getDouble(2)).toSeq === rows.map(_.getDouble(2)).sorted.toSeq)

    // in the Lookup shape the returned plan IS the rerank — its file scan
    // must show the pushed id IN-list doing real work
    val scans = fileScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a FileSourceScanExec under the lookup rerank")
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    val rowsRead = scans.map(_.metrics("numOutputRows").value).sum
    val totalFiles = {
      val p = new org.apache.hadoop.fs.Path(ReleaseShape.wideDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    }
    info(s"wide rerank scan: $rowsRead rows surfaced, $filesRead of $totalFiles files listed")
    // `numFiles` counts files LISTED at planning (no partition column →
    // all of them); the pruning that matters happens inside the scan —
    // parquet row-group min/max stats and the page column index drop
    // everything but the row groups holding the ≤100 pushed ids, so the
    // rows the scan materializes are orders of magnitude under the table
    assert(filesRead === totalFiles)
    assert(rowsRead < ReleaseShape.WideN / 100,
      s"scan surfaced $rowsRead rows — reads like a full scan, not a lookup")
  }
}
