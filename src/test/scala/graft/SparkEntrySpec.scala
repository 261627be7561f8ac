package graft

import org.scalatest.funsuite.AnyFunSuite

class SparkEntrySpec extends AnyFunSuite {

  test("every query carries a DuckDB oracle (no silent rows-only downgrades)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty, s"queries missing oracles: ${q.diff(o).toSeq.sorted}")
    assert(o.diff(q).isEmpty, s"orphaned oracles: ${o.diff(q).toSeq.sorted}")
  }

  test("query names are unique across domain maps (no silent overwrites)") {
    val maps = Seq(
      graft.queries.RelationalQueries.defs, graft.queries.StatsQueries.defs,
      graft.queries.PipelineQueries.defs, graft.queries.EventQueries.defs,
      graft.queries.MultimodalQueries.defs, graft.queries.SourceQueries.defs,
      graft.queries.LookupQueries.defs, graft.queries.ReportQueries.defs)
    val all = maps.flatMap(_.keys)
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.toSeq.sorted}")
    assert(all.size == SparkEntry.queries.size)
  }
}
