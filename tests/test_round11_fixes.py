"""Round-11 maintenance-fix regression tests (ADVICE r10 + VERDICT
r10 item 5): the four low ADVICE items each get a named pin here, and
the shared wedge-enumeration helper is proven to keep
triangle_count_parts and transitivity_parts in exact agreement.
"""

from __future__ import annotations

import math

import duckdb


SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- ADVICE 4
def test_per_vec_sql_pinned_to_ece():
    """stats10._PER_VEC_SQL must stay the byte-exact prefix of
    embedding_ops.ECE_SQL so isotonic/platt score vectors identically
    to ece_calibration (ADVICE r10)."""
    from cgtcalc_data_transformer_spark.operators import embedding_ops, stats10

    assert stats10._PER_VEC_SQL.strip() in embedding_ops.ECE_SQL


# ---------------------------------------------------------------- ADVICE 2
def test_logit_step_singular_hessian_skips():
    """A single occupied x bin makes the 2x2 Hessian singular
    (h01 = x·h00, h11 = x²·h00 ⇒ det = 0); the Newton step must be
    skipped, not divide by zero (ADVICE r10)."""
    from cgtcalc_data_transformer_spark.operators.stats_ext import _logit_step

    assert _logit_step([(3, 100, 40)], 0.0, 0.0) == (0.0, 0.0)
    # empty bins is the fully-degenerate edge: all sums 0, det 0
    assert _logit_step([], 0.25, -0.5) == (0.25, -0.5)


def test_clamp_p_identity_in_interior():
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        LOGIT_EPS,
        _clamp_p,
    )

    assert _clamp_p(0.0) == LOGIT_EPS
    assert _clamp_p(1.0) == 1.0 - LOGIT_EPS
    for p in (1e-6, 0.25, 0.5, 0.999):
        assert _clamp_p(p) == p
    # the degenerate log-loss is now finite in the driver path
    assert math.isfinite(math.log(_clamp_p(0.0)))


def test_platt_and_logistic_share_guarded_step_sql():
    """Both logistic oracles must embed the ONE shared det-guarded
    step chain and the ln-clamped loss tail — the drift ADVICE r10
    warned about is impossible while this holds."""
    from cgtcalc_data_transformer_spark.operators.stats10 import PLATT_SQL
    from cgtcalc_data_transformer_spark.operators.stats_ext import (
        LOGISTIC_IRLS_SQL,
        logit_loss_sql,
        logit_steps_sql,
    )

    steps, loss = logit_steps_sql(), logit_loss_sql()
    assert "CASE WHEN" in steps and "= 0 THEN b0" in steps
    assert "GREATEST(LEAST(" in loss
    for sql in (PLATT_SQL, LOGISTIC_IRLS_SQL):
        assert steps in sql
        assert loss in sql


# ---------------------------------------------------------------- ADVICE 1
def _gammp(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x) — series /
    continued-fraction split, used only to re-derive the chi2
    critical-value literals independently."""
    if x < a + 1:
        ap, s = a, 1.0 / a
        d = s
        for _ in range(10000):
            ap += 1
            d *= x / ap
            s += d
            if abs(d) < abs(s) * 1e-16:
                break
        return s * math.exp(-x + a * math.log(x) - math.lgamma(a))
    tiny = 1e-300
    b, c, d = x + 1 - a, 1 / tiny, 1 / (x + 1 - a)
    h = d
    for i in range(1, 10000):
        an = -i * (i - a)
        b += 2
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1 / d
        de = d * c
        h *= de
        if abs(de - 1) < 1e-16:
            break
    return 1 - math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def test_chi2_crit_table_exact_and_in_both_twins():
    """The CHI2_CRIT_95 literals must be the exact chi2 0.95
    quantiles (recomputed here by bisection on an independent
    incomplete-gamma implementation) and appear verbatim in the
    oracle's CASE (ADVICE r10)."""
    from cgtcalc_data_transformer_spark.operators.stats9 import (
        CHI2_CRIT_95,
        CRAMERS_V_SQL,
    )

    assert set(CHI2_CRIT_95) == {24, 48, 72, 96}
    for df, cv in CHI2_CRIT_95.items():
        lo, hi = 0.0, 4.0 * df + 100.0
        for _ in range(60):
            mid = (lo + hi) / 2
            if _gammp(df / 2.0, mid / 2.0) < 0.95:
                lo = mid
            else:
                hi = mid
        assert abs(cv - (lo + hi) / 2) < 5e-6, (df, cv, (lo + hi) / 2)
        assert f"WHEN {df} THEN {cv!r}" in CRAMERS_V_SQL
    # the WH fallback must survive for unlisted dof
    assert "ELSE CAST(dof AS DOUBLE) * wh * wh * wh END" in CRAMERS_V_SQL


# ---------------------------------------------------------------- ADVICE 3
def test_spectral_entropy_zero_power_guard(spark, tmp_path):
    """An all-constant daily series over LCM(7,14,30) = 210 days has
    EXACTLY zero spectral power at every tested period (the 1e-9
    integer trig cycles sum to 0), which used to be 0/0 NaN; both
    twins must now report shares 0 and entropy 0 (ADVICE r10)."""
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        SPECTRAL_ENTROPY_SQL,
        spectral_entropy_daily,
    )

    sf_dir = str(tmp_path)
    spark.sql(
        """
        SELECT CAST(id AS LONG) AS event_id,
               timestamp_micros(CAST(id * 86400000000 + 43200000000 AS LONG)) AS ts,
               CAST(1 AS LONG) AS user_id,
               'steady' AS event_type,
               CAST(1.0 AS DOUBLE) AS value,
               '{}' AS props
        FROM range(210)
        """
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    out = spectral_entropy_daily(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["event_type"] == "steady"
    assert r["entropy_micro"] == 0
    assert all(v == 0 for k, v in r.items() if k.endswith("_micro"))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet/*.parquet'"
    )
    orows = con.execute(SPECTRAL_ENTROPY_SQL).fetchall()
    cols = [d[0] for d in con.description]
    assert len(orows) == 1
    od = dict(zip(cols, orows[0]))
    assert od["entropy_micro"] == 0
    assert all(v == 0 for k, v in od.items() if k.endswith("_micro"))


# ------------------------------------------------------- VERDICT r10 item 5
def test_wedge_helper_shared_and_counts_agree(spark):
    """triangle_count_parts and transitivity_parts now consume the
    ONE oriented_wedges implementation in graph.py; their triangle /
    edge / node counts must agree exactly, and match the id-ordered
    DuckDB closure."""
    from cgtcalc_data_transformer_spark.operators.graph import (
        triangle_count_parts,
    )
    from cgtcalc_data_transformer_spark.operators.stats10 import (
        transitivity_parts,
    )

    t = triangle_count_parts(spark, SF).collect()[0].asDict()
    c = transitivity_parts(spark, SF).collect()[0].asDict()
    for k in ("n_nodes", "n_edges", "n_triangles"):
        assert t[k] == c[k], k

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'"
    )
    want = con.execute(
        """
        WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        edges AS (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lp a JOIN lp b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        )
        SELECT (SELECT COUNT(*) FROM edges e1
                JOIN edges e2 ON e2.u = e1.v
                JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)
        """
    ).fetchone()[0]
    assert t["n_triangles"] == want
