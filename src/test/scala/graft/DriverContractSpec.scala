package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: every declared query must carry a
  * DuckDB oracle (a queries entry without one silently records `no_oracle`
  * in the correctness gate — the board's only historical gap). */
class DriverContractSpec extends AnyFunSuite {
  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("oracle SQL mentions every output column it must match") {
    // cheap sanity: the pinned-constant oracles must carry the oracle_sf tag
    for (name <- Seq("q34_logistic", "q38_simhash_pairs", "q46_ivf_recall",
        "q49_lasso", "q51_bootstrap", "q52_permutation", "q58_ipw_ate",
        "q62_ttest_one_sided", "q65_csv_rename_split", "q69_xexpt_sum",
        "q71_xexpt_cuped"))
      assert(SparkEntry.oracleSql(name).contains("oracle_sf"),
        s"$name pins sf-specific constants but lacks the oracle_sf tag")
  }
}
