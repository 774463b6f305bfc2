package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the driver-facing surface: every oracle belongs to a
  * registered query, rows-only queries are exactly the documented
  * approximate/not-SQL-expressible set, and every query materializes at
  * the smallest SF. Catches wiring drift (a renamed key, an orphaned
  * oracle) before the round's correctness gate does.
  */
class EntryContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Approximate candidate generators and ML-assisted ops — checked by
    * brute-force-comparison specs instead of SQL oracles.
    */
  private val RowsOnly = Set("dedup_minhash", "dedup_simhash", "dedup_candidates",
    "dedup_clusters_minhash", "dedup_embedding_lsh", "nullcheck_approx",
    "events_hourly_approx", "ann_lsh", "ann_ivf", "ann_pq", "ann_ivfpq",
    "ann_recall", "ann_recall_sweep", "ann_recall_gauss", "ann_advisor",
    "ann_advised_recall", "text_bpe", "text_vectorize",
    "dedup_incremental_minhash")

  test("every oracle key has a query; rows-only set is exactly as documented") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
    assert(q.diff(o) == RowsOnly, s"undocumented rows-only queries: ${q.diff(o).diff(RowsOnly)}")
  }

  /** keyfinder_lineitem is legitimately empty at sf0.001: the synthetic
    * lineitem there has duplicate rows even over all four candidate
    * columns, and the DuckDB oracle agrees (0 = 0 rows).
    */
  private val MayBeEmpty = Set("keyfinder_lineitem")

  test("every registered query runs; all but the documented ones return rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.sf0001).count()
      assert(n > 0 || MayBeEmpty(name), s"$name returned no rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no oracle SQL uses a bare \\s class (RE2 excludes U+000B, Java includes it)") {
    // the whitespace-parity contract: every whitespace class shipped to
    // DuckDB must be TextOps.WsClass spelled out, never \s — the two
    // engines disagree on vertical tab and a \x0B-bearing document
    // would fingerprint/tokenize differently per engine
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("\\s"),
        s"oracle '$name' contains a bare \\s whitespace class")
    }
  }
}
