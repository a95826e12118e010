package graft

import org.apache.spark.sql.SparkSession

import graft.core.CellMath
import graft.engine.{LopqIndexStore, LopqSearcher, ReleaseShape}

/** Dev tool: per-stage wall-clock of one slim release query (cell walk,
  * slice fetch, ADC-table build, approx scan, rerank) — where does a
  * release-shape query's latency actually go?
  * Usage: runMain graft.ProbeRelease [v2|v3] [queryId]
  */
object ProbeRelease {
  def main(args: Array[String]): Unit = {
    val s = args.headOption.getOrElse("v3") match {
      case "v2" => ReleaseShape.V2
      case _ => ReleaseShape.V3
    }
    val qid = args.drop(1).headOption.map(_.toLong).getOrElse(997L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe-release] $label%-22s ${(System.nanoTime() - t0) / 1e6}%9.1f ms")
      r
    }

    val idx = t("loadSlim")(LopqIndexStore.loadSlim(spark, s.dir).get)
    val vectors = ReleaseShape.vectors(spark, s.dir)
    (1 to 3).foreach { pass =>
      println(s"--- pass $pass (query $qid) ---")
      val query = ReleaseShape.rowVecFor(s, qid)
      val aq = t("pca")(idx.pca.map(_.apply(query)).getOrElse(query))
      val (d0, d1) = t("coarseDistances")(idx.slim.coarseDistances(aq))
      val cells = t("selectCells")(
        LopqSearcher.selectCellsFrom(idx.slim.v, d0, d1, ReleaseShape.Quota, idx.cellCounts))
      val keys = cells.flatMap { c =>
        val (c0, c1) = CellMath.unpackCell(c, idx.slim.v); Seq((0, c0), (1, c1))
      }.distinct
      val rot = t(s"slices(${keys.size})")(
        LopqIndexStore.rotationSlices(spark, s.dir, keys))
      val tables = t(s"adcTables(${cells.size})")(
        cells.map { c =>
          val cc = CellMath.unpackCell(c, idx.slim.v)
          (c, idx.slim.adcTables(aq, cc, (sp, cl) => rot((sp, cl))).map(_.toSeq).toSeq)
        })
      import spark.implicits._
      val tablesDf = tables.toDF("cell_id", "adc_tables")
      val full = t("searchSlim e2e")(
        LopqSearcher.searchSlim(idx, vectors, "vec_id", "embedding", query,
          ReleaseShape.Quota, ReleaseShape.TopK, ReleaseShape.RerankK))
      t("materialize")(full.write.format("noop").mode("overwrite").save())
      val _ = tablesDf
    }
    spark.stop()
  }
}
