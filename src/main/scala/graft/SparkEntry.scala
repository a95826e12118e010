package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory lives in `graft.ops.*` catalogs; this object just
  * flattens them into the driver's `queries` / `oracleSql` maps. */
object SparkEntry {
  /** All catalog groups, in SURVEY §2 order. */
  def catalog: Seq[QueryDef] =
    Relational.defs ++ TextOps.defs ++ TextScreen.defs ++
      VectorQueries.defs ++ MultimodalOps.defs ++ StreamingOps.defs ++
      EngineOps.defs ++ PipelineOps.defs ++ ScaleOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_group_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline queries for Bench. */
  def benchQueries: Seq[String] = benchDefs.map(_.name)

  /** Full defs of the headline queries (Bench needs `dependsOnIndex`). */
  def benchDefs: Seq[ops.QueryDef] = catalog.filter(_.bench)
}
