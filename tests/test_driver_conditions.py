"""Environment-invariance gate for the driver's correctness check.

Round-5 lesson: four ops passed the local DuckDB differential under
every config we tried yet failed the official driver check
(CORRECTNESS_r05.json hash_match false). Root cause was NOT the Spark
session at all — the oracles emitted DuckDB HUGEINT columns
(un-cast integer SUMs) that a pandas/Arrow fetch turns into
float64/decimal while Spark emits int64; the local ``fetchall()``
masked it by converting HUGEINT to Python int. Two defenses now:

1. ``test_no_hugeint_oracle_outputs`` — every oracle's DECLARED result
   types must match Spark's numeric class column-for-column (DESCRIBE
   binds without executing, so this covers all 168 oracles in seconds).
2. ``test_hostile_session_parity`` — the epoch/time-deriving ops that
   motivated the TZ hypothesis re-run under a deliberately hostile
   session (non-UTC fixed-offset timezone + ANSI mode ON, the confs the
   driver demonstrably runs) and must still match DuckDB bit-for-bit.
   This pins ``epoch_us_utc`` (operators/registry.py) as the only
   sanctioned epoch-extraction path.
"""

from __future__ import annotations

import duckdb
import pytest

from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
    REGISTRY,
)

from conftest import SF_CORRECT

pytestmark = pytest.mark.parity

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

from health_etl_pipeline_and_analytics_with_machine_learning_spark.oracle_types import (  # noqa: E402
    class_mismatches,
)

#: the ops that derive epooch/date numbers from the NTZ ``ts``/date
#: columns — the surface the TZ-invariance fix covers
_TZ_SENSITIVE = [
    "column_profile",
    "interval_concurrency_peak",
    "gaps_islands_streaks",
    "skew_diagnosis_gini",
    "range_interval_window",
    "time_weighted_avg",
    "attribution_position_based",
    # streaming wall-clock renderers (r6 full-registry hostile sweep
    # found these two; the fix is streaming/sessionize.py's
    # _wall_ts/_fmt_wall session-offset pins)
    "streaming_hour_rollup",
    "streaming_cdc_compaction",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_CORRECT}/{t}.parquet')"
        )
    yield con
    con.close()


# ONE canon protocol repo-wide: reuse test_oracle_parity's (r16 review
# caught this file carrying a verbatim fork of it — the drifting-copy
# class the shared assert_matches_oracle helper exists to prevent)
from test_oracle_parity import canon as _canon  # noqa: E402


def test_no_hugeint_oracle_outputs(spark, duck):
    """Every oracle's declared output types share Spark's numeric class.

    HUGEINT/DECIMAL (or int-vs-float class flips) in any output column
    is exactly the r5 driver-red failure mode; DESCRIBE binds the query
    without running it, so the sweep is cheap enough to cover all
    oracles every session.
    """
    errs = []
    for name, rq in REGISTRY.items():
        if rq.oracle is None:
            continue
        schema = rq.fn(spark, SF_CORRECT).schema
        desc = duck.execute(f"DESCRIBE {rq.oracle}").fetchall()
        errs += [f"{name}.{e}" for e in class_mismatches(desc, schema)]
    assert not errs, errs


def test_dst_zone_epoch_contract(spark, tmp_path):
    """Pin epoch_us_utc's behavior under a DST session zone (ADVICE r6:
    the NTZ→TIMESTAMP cast resolves the offset at local wall time,
    from_utc_timestamp at the instant — so DST zones COULD diverge).

    Empirical contract, asserted here with synthetic events placed
    inside and around both 2024 America/New_York transitions: the two
    resolutions cancel for every wall clock that EXISTS in the zone —
    including ambiguous fall-back times — and diverge ONLY for wall
    times inside the spring-forward gap (nonexistent local times),
    which normalize forward by exactly the gap width. The driver
    session is UTC, so the gap edge never reaches certification."""
    import duckdb as _duckdb
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
        epoch_us_utc,
        load,
    )
    from pyspark.sql import functions as F

    walls = [
        "2024-03-10 01:59:59",  # last instant before the spring-forward gap
        "2024-03-10 02:30:00",  # INSIDE the gap — nonexistent local time
        "2024-03-10 03:00:00",  # first instant after the gap
        "2024-11-03 00:30:00",
        "2024-11-03 01:30:00",  # ambiguous (fall-back hour occurs twice)
        "2024-11-03 02:30:00",
        "2024-06-15 12:00:00",
        "2024-01-15 12:00:00",
    ]
    gap = {"2024-03-10 02:30:00"}
    ts = [datetime.fromisoformat(w) for w in walls]
    tbl = pa.table(
        {
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "event_id": list(range(len(ts))),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    con = _duckdb.connect()
    oracle = dict(
        con.execute(
            f"SELECT event_id, epoch_us(ts) FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        ).fetchall()
    )
    saved_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = {
            r.event_id: r.ep
            for r in load(spark, str(tmp_path), "events")
            .select("event_id", epoch_us_utc(F.col("ts")).alias("ep"))
            .collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved_tz)
    for i, w in enumerate(walls):
        if w in gap:
            # nonexistent wall time: normalized forward by the 1 h gap
            assert got[i] - oracle[i] == 3_600_000_000, (w, got[i], oracle[i])
        else:
            assert got[i] == oracle[i], (w, got[i], oracle[i])


def test_hostile_session_parity(spark, duck):
    """The TZ-sensitive ops match DuckDB under non-UTC TZ + ANSI."""
    saved_tz = spark.conf.get("spark.sql.session.timeZone")
    saved_ansi = spark.conf.get("spark.sql.ansi.enabled")
    try:
        # fixed-offset zone: epoch shift is unconditional (no DST window
        # to luck through) — the strictest cheap hostile setting
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        spark.conf.set("spark.sql.ansi.enabled", "true")
        for name in _TZ_SENSITIVE:
            rq = REGISTRY[name]
            sdf = rq.fn(spark, SF_CORRECT)
            s_rows = [tuple(r) for r in sdf.collect()]
            res = duck.execute(rq.oracle)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
            assert sorted(sdf.columns) == sorted(o_cols), name
            cs, co = _canon(s_rows, sdf.columns), _canon(o_rows, o_cols)
            assert len(cs) == len(co), f"{name}: {len(cs)} vs {len(co)} rows"
            diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
            assert cs == co, f"{name}: first diffs {diffs}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved_tz)
        spark.conf.set("spark.sql.ansi.enabled", saved_ansi)


def test_bench_pick_reference_walks_past_same_round_and_bad_blobs(tmp_path):
    """The bench artifact's cross-round reference selection (r15,
    ADVICE r14): from a history of [malformed blob, same-round
    artifact, older-round artifact], pick_reference must skip the
    unreadable commit, skip the current round's own artifact (the
    final-HEAD commit that made a plain HEAD read self-compare), and
    land on the older round's — and return (None, None) when only the
    current round's artifacts exist."""
    import json
    import subprocess

    from bench import pick_reference

    import os

    # inherit the caller's env (git may live anywhere) but pin identity
    # and neutralize host gitconfig (gpgsign/hooksPath would break the
    # scratch commits)
    env = dict(
        os.environ,
        GIT_AUTHOR_NAME="t",
        GIT_AUTHOR_EMAIL="t@t",
        GIT_COMMITTER_NAME="t",
        GIT_COMMITTER_EMAIL="t@t",
        GIT_CONFIG_GLOBAL="/dev/null",
        GIT_CONFIG_SYSTEM="/dev/null",
    )

    def git(repo, *args):
        subprocess.run(
            ["git", *args], cwd=repo, check=True, capture_output=True, env=env
        )

    def commit(repo, content: str):
        (tmp_path / repo / "BENCH_LOCAL.json").write_text(content)
        git(tmp_path / repo, "add", "BENCH_LOCAL.json")
        git(tmp_path / repo, "commit", "-qm", "x")

    repo = str(tmp_path / "scratch")
    (tmp_path / "scratch").mkdir()
    git(repo, "init", "-q")

    commit("scratch", json.dumps({"producing_round": 14, "sentinel_mid": 0.4,
                                  "queries": {"q": 1.0}}))
    commit("scratch", json.dumps({"producing_round": 15, "sentinel_mid": 0.5,
                                  "queries": {"q": 1.1}}))
    commit("scratch", '{"truncated": ')  # the BENCH_r05-style clipped blob

    ref, commit_hash = pick_reference(repo, 15)
    assert ref is not None and commit_hash
    assert ref["producing_round"] == 14 and ref["sentinel_mid"] == 0.4

    # legacy artifacts without the field qualify as other-round
    commit("scratch", json.dumps({"sentinel_mid": 0.3, "queries": {"q": 0.9}}))
    ref2, _ = pick_reference(repo, 15)
    assert ref2["sentinel_mid"] == 0.3 and "producing_round" not in ref2

    # only same-round artifacts → no reference, not a crash
    repo2 = str(tmp_path / "scratch2")
    (tmp_path / "scratch2").mkdir()
    git(repo2, "init", "-q")
    commit("scratch2", json.dumps({"producing_round": 15, "sentinel_mid": 0.5,
                                   "queries": {"q": 1.0}}))
    assert pick_reference(repo2, 15) == (None, None)
