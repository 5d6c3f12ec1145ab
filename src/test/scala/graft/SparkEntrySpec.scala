package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the exact properties the harness relies on. */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
    assert(qs.forall(_.matches("[a-z0-9_]+")))
  }

  test("every query has an oracle unless it is a documented rows-only registration") {
    // approximate or non-relational by NATURE — each Scaladoc'd as
    // rows-only by design; anything else missing an oracle is a forgotten
    // gate, not a decision
    val rowsOnlyByDesign = Set(
      "q_ann_pq_topk",     // lossy quantization
      "q_ann_ivfpq_topk",  // lossy quantization
      "q_ann_ivfpq_probe_audit", // lossy quantization; in-plan 0.8 recall floor IS the gate
      "q_ann_pq_probe_audit", // lossy quantization; in-plan 0.8 recall floor IS the gate
      "q_hll_distinct",    // approximate sketch
      "q_compress_ratio")  // zlib has no SQL mirror
    val missing = SparkEntry.queries.keySet
      .diff(SparkEntry.oracleSql.keySet).diff(rowsOnlyByDesign)
    assert(missing.isEmpty, s"queries without an oracle or a rows-only rationale: $missing")
    val stale = rowsOnlyByDesign.diff(SparkEntry.queries.keySet)
    assert(stale.isEmpty, s"rows-only allowlist entries no longer registered: $stale")
  }

  test("registry names are unique (a duplicate would silently shadow a query)") {
    val names = Queries.registry.map(_._1)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate registry names: $dups")
    // and the Map the driver consumes really carries every registered query
    assert(SparkEntry.queries.size == names.size)
  }

  test("every query runs and yields rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, fn) =>
      fn(spark, "/root/testdata/sf0.001").limit(1).count() == 0
    }.map(_._1)
    // point lookups and the no-orders anti-join may legitimately be empty at
    // the smallest sf; everything else must produce rows
    val allowedEmpty = Set("q_p5_point_lookup", "q_p6_filter_eq", "q_j3_anti")
    assert(empty.toSet.subsetOf(allowedEmpty), s"unexpectedly empty: $empty")
  }
}
