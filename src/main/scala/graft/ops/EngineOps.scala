package graft.ops

/** LOPQ engine surface (train/encode/search), streaming ingest, and
  * multimodal operators. These are not ANSI-SQL-expressible, so entries here
  * mostly omit `oracle` (driver records a rows-only check); quality is
  * asserted by ScalaTest recall/parity suites instead. Populated as the
  * engine lands. */
object EngineOps {
  val defs: Seq[QueryDef] = Seq.empty
}
