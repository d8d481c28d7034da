"""crawl_churn_report: the six churn counts must be internally
consistent and agree with a direct recomputation from the two phases."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as e

SF = "/root/testdata/sf0.001"


def test_churn_consistency(spark):
    assign0, final = e._crawl_phases(spark, SF)
    rep = e.q_crawl_churn_report(spark, SF).toPandas().iloc[0]

    a0 = assign0.toPandas().set_index("id")["cluster_id"]
    fin = final.toPandas().set_index("id")["cluster_id"]
    assert rep["n_old_docs"] == len(a0)
    assert rep["n_new_docs"] == len(fin) - len(a0)
    assert rep["n_old_clusters"] == a0.nunique()
    assert rep["n_final_clusters"] == fin.nunique()
    changed = [i for i in a0.index if fin[i] != a0[i]]
    assert rep["n_old_docs_relabeled"] == len(changed)
    assert rep["n_old_clusters_changed"] == len({a0[i] for i in changed})
    # structural invariants: merging can only reduce cluster count
    # among old docs; every old doc appears in the final table
    assert set(a0.index) <= set(fin.index)
    old_final_clusters = len({fin[i] for i in a0.index})
    assert old_final_clusters <= rep["n_old_clusters"]
