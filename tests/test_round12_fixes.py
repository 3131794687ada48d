"""Round-12 maintenance-fix regression tests (ADVICE r11 + VERDICT
r11 item 1): named pins for the two union-recompute plan fixes and
the three low ADVICE items.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


# ------------------------------------------------- VERDICT r11 item 1a
def test_simjoin_summary_overlap_frame_is_cached(spark):
    """Both union branches of simjoin_prefix_summary must read the
    overlap frame through ONE cache — before the fix the candidate
    join + overlap aggregation executed once per branch (confirmed
    2x at sf0.1). The cached-plan rewrite shows an InMemoryRelation
    for ov in addition to the shingles cache."""
    from cgtcalc_data_transformer_spark.operators.dedup import (
        simjoin_prefix_summary,
    )

    df = simjoin_prefix_summary(spark, SF)
    cached = df._jdf.queryExecution().withCachedData().toString()
    # shingles cache + ov cache — at least two distinct cache reads
    assert cached.count("InMemoryRelation") >= 2, cached[:2000]


# ------------------------------------------------- VERDICT r11 item 1b
def test_local_clustering_single_wedge_execution(spark):
    """local_clustering_topk's corner crediting must be ONE explode
    over the closed-wedge frame, not a 3-way union that re-executes
    the O(E^1.5) wedge join per branch (confirmed 3x: 19
    SortMergeJoins vs triangle_count_parts' 6). Join count in the
    optimized plan must now sit at triangle_count_parts' level."""
    from cgtcalc_data_transformer_spark.operators.graph import (
        local_clustering_topk,
        triangle_count_parts,
    )

    lcc = (
        local_clustering_topk(spark, SF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    tri = (
        triangle_count_parts(spark, SF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    n_lcc, n_tri = lcc.count("Join "), tri.count("Join ")
    # one extra join (degree join for the coefficient) is expected;
    # the pre-fix plan carried ~3x the joins
    assert n_lcc <= n_tri + 2, (n_lcc, n_tri)
    assert "Generate explode" in lcc or "explode" in lcc.lower()


# ---------------------------------------------------------------- ADVICE 1
# doc_ids bucketed by the shared md5 rule: md5(id)[:8] % 100 >= 90 ⇒
# held. Verified literals (round-12 session): 8,20,25 are held;
# 1..6 are train.
_HELD_IDS = [8, 20, 25]
_TRAIN_IDS = [1, 2, 3]


def test_stupid_backoff_surfaces_held_only_language(spark, tmp_path):
    """A language whose docs ALL land in the 10% held split must
    surface as an all-unseen row, not vanish (ADVICE r11: the inner
    ntot join dropped it). Both twins on a crafted corpus where
    language 'zz' exists only in held docs."""
    from cgtcalc_data_transformer_spark.operators.corpus_lm import (
        STUPID_BACKOFF_SQL,
        stupid_backoff_score,
    )

    rows = [
        (i, "the quick brown fox jumps over the dog", "en", "s", 39)
        for i in _TRAIN_IDS
    ] + [
        (i, "zulu zebra zone zulu zebra zone", "zz", "s", 31)
        for i in _HELD_IDS
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    out = {
        r["lang"]: r
        for r in stupid_backoff_score(spark, sf_dir).collect()
    }
    assert "zz" in out, "held-only language dropped by the train-totals join"
    zz = out["zz"]
    assert zz["n_unseen"] == zz["n_positions"] > 0
    assert zz["n_tri"] == zz["n_bi"] == zz["n_uni"] == 0
    assert zz["avg_score_micro"] == 0

    con = duckdb.connect()
    pq_glob = os.path.join(sf_dir, "documents.parquet", "*.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq_glob}')"
    )
    oracle = {
        r[0]: r for r in con.execute(STUPID_BACKOFF_SQL).fetchall()
    }
    assert "zz" in oracle
    assert oracle["zz"][1] == zz["n_positions"]
    assert oracle["zz"][5] == zz["n_unseen"]


# ---------------------------------------------------------------- ADVICE 2
def test_kpss_weights_derived_from_lags():
    """The Bartlett weight collapse must be generated from KPSS_LAGS
    in both twins (ADVICE r11: it was hardcoded at L=4 while the
    constant read as tunable). Pin the L=4 rendering AND prove the
    SQL regrows when the constant changes by re-exec'ing the module
    source with KPSS_LAGS=5."""
    import inspect

    from cgtcalc_data_transformer_spark.operators import stats11

    assert stats11._KPSS_DEN == "5 * g0 + 2 * (4 * g1 + 3 * g2 + 2 * g3 + 1 * g4)"
    assert stats11.KPSS_SQL.count(stats11._KPSS_DEN) == 2
    assert "AS g4" in stats11.KPSS_SQL and "AS g5" not in stats11.KPSS_SQL

    src = inspect.getsource(stats11)
    assert "KPSS_LAGS = 4" in src
    patched = src.replace("KPSS_LAGS = 4", "KPSS_LAGS = 5", 1)
    ns: dict = {"__name__": "stats11_patched"}
    exec(compile(patched, "stats11_patched", "exec"), ns)  # noqa: S102
    assert "AS g5" in ns["KPSS_SQL"]
    assert ns["_KPSS_DEN"] == "6 * g0 + 2 * (5 * g1 + 4 * g2 + 3 * g3 + 2 * g4 + 1 * g5)"


# ---------------------------------------------------------------- ADVICE 3
def test_ordinal_panel_counts_are_exact_integers(spark):
    """concordant/discordant must come back as BIGINT (exact to 2^63)
    rather than DOUBLE (silently loses integer exactness past 2^53)
    — ADVICE r11. Both twins."""
    from pyspark.sql.types import LongType

    from cgtcalc_data_transformer_spark.operators.stats11 import (
        ORDINAL_ASSOC_SQL,
        ordinal_association_panel,
    )

    df = ordinal_association_panel(spark, SF)
    schema = {f.name: f.dataType for f in df.schema.fields}
    assert isinstance(schema["concordant"], LongType)
    assert isinstance(schema["discordant"], LongType)
    assert "CAST(cc AS BIGINT)" in ORDINAL_ASSOC_SQL
    assert "CAST(cc AS DOUBLE) AS concordant" not in ORDINAL_ASSOC_SQL


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])
