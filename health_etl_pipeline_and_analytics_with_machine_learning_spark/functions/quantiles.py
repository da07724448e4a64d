"""Distributed EXACT quantiles — the scale path for the reference's
exact medians/IQR (SURVEY §4.3).

Spark's built-in exact ``percentile`` aggregate buffers every distinct
value (a value→count map) inside one final aggregation state — correct,
but a single-node memory funnel: at 100 TB it OOMs the task that merges
the buffers. ``percentile_approx`` fixes memory but changes answers,
which the parity tier can't accept.

This module computes exact interpolated quantiles by DISTRIBUTED
SELECTION (bucket refinement — the classic k-th-smallest algorithm),
replacing the r1 histogram/range-partition design whose first stage
shuffled one row per DISTINCT value (at 100 TB: billions of rows).
Here no stage ever moves more than ``N_BUCKETS`` rows per map task:

1. one aggregate → (count, nan count, min, max) per column;
2. one aggregate → a fixed-width ``N_BUCKETS``-bucket count histogram
   (map-side partial, ≤ N_BUCKETS rows per task, collected to the
   driver: O(N_BUCKETS) driver memory);
3. the cumulative histogram locates the bucket holding each needed
   global rank k = the flanking positions of pos = (n−1)·p (0-based,
   computed BEFORE the 1-based shift so the fraction survives IEEE
   rounding);
4. one job collects the (value, count) pairs of just those buckets —
   expected n/N_BUCKETS values each — and walks to the k-th value;
   a bucket whose count exceeds ``MAX_BOUNDARY_COLLECT`` (value skew)
   recurses: re-bucket THAT bucket's value range, shrinking the
   candidate set ×N_BUCKETS per level (≤ log_B(n) levels, 2–3 at
   100 TB), so both collect size and driver memory stay bounded.

Multi-column batching (``exact_quantiles_multi``) runs stages 1/2/4
for ALL requested columns in single passes, so e.g. four medians cost
three jobs total, not twelve. The histogram/boundary passes ride Arrow
batches with numpy ``bincount``/``unique`` partials (``_multi_pass`` —
the r1–r8 struct-array explode paid row-count × column-count
intermediate rows per pass, 10× the scan cost at 25 columns).

NaN and ±Infinity follow IEEE/Spark sort order (−inf < finite < +inf
< NaN): all four regions count toward n; ranks landing in the −inf,
+inf, or NaN prefix/suffix regions resolve in closed form from the
region counts, and bucket selection runs only over the FINITE window
(so an infinite outlier can't produce an infinite bucket width).
Nulls are ignored.

Rank extraction and interpolation are the SHARED invariant-6 math
(``functions.rank_math`` — one definition for this engine, the grouped
in-plan engine, and the quantile-normalize op), so results are
bit-comparable with the oracle (pinned by tests/test_quantiles.py
against the built-in exact percentile; see BASELINE.md "Certification
invariants" item 6 and the rank_math module docstring).
"""

from __future__ import annotations

import bisect
import math
from collections import defaultdict
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rank_math import interp, rank_spec

#: histogram resolution per refinement level; driver memory is O(this)
N_BUCKETS = 8192
#: a located bucket with more rows than this recurses instead of
#: collecting (value skew guard); expected bucket load is n/N_BUCKETS
MAX_BOUNDARY_COLLECT = 65536
#: refinement depth guard — progress is guaranteed while lo < hi, but
#: degenerate FP ranges fall back to an exact histogram collect
MAX_DEPTH = 64


def _bucket_expr(v, lo: float, width: float):
    """The shared JVM-side bucket assignment; `_bucket_of` is its exact
    Python twin (both pure IEEE-double ops, so they always agree)."""
    return F.least(
        F.lit(N_BUCKETS - 1),
        F.floor((v - F.lit(lo)) / F.lit(width) * N_BUCKETS),
    ).cast("int")


def _bucket_of(v: float, lo: float, width: float) -> int:
    return min(N_BUCKETS - 1, int(math.floor((v - lo) / width * N_BUCKETS)))


#: transport crossover (r10, measured at sf0.1/600k rows): the Arrow
#: path pays a fixed Python-worker + Arrow-serialization cost PER PASS
#: that the JVM explode path does not, while the explode path pays
#: row-count × column-count intermediate rows that Arrow does not. At
#: 1 column the fixed cost dominated — iqr_clip read 0.64 s (r8, JVM)
#: → 1.08 s (r9, Arrow-always); at 25 columns the explode rows
#: dominated — the ETL sweep read 4.9 s (JVM) vs ~1.1 s (Arrow). The
#: hybrid keeps both certified transports and dispatches on column
#: count (bucket math is bit-identical on both sides, so the choice is
#: invisible to results — pinned by the engine property suite).
JVM_TRANSPORT_MAX_COLS = 8


def _multi_pass(
    df: DataFrame,
    specs: list[tuple[str, float, float]],
    needed: dict[str, list[int]] | None,
):
    """The multi-column histogram / boundary-value transport. Two
    bit-identical implementations, dispatched on column count (see
    :data:`JVM_TRANSPORT_MAX_COLS`): few columns ride the JVM
    struct-explode (codegen, no Python workers), many columns ride
    Arrow batches + numpy ``bincount``/``unique`` partials.

    ``needed`` is None for the HISTOGRAM pass (emit (c, b, cnt) bucket
    partials) or a {col: [bucket...]} map for the BOUNDARY pass (emit
    (c, v, cnt) value partials for just those buckets — expected
    n/N_BUCKETS values per bucket). Each task's output is bounded by
    N_BUCKETS (histogram) / the boundary buckets' distinct values —
    the driver collect stays O(N_BUCKETS)-ish either way."""
    if len(specs) <= JVM_TRANSPORT_MAX_COLS:
        return _multi_pass_jvm(df, specs, needed)
    return _multi_pass_arrow(df, specs, needed)


def _multi_pass_jvm(
    df: DataFrame,
    specs: list[tuple[str, float, float]],
    needed: dict[str, list[int]] | None,
):
    """JVM transport: ``explode(array(<struct per column>))`` into a
    hash aggregate — the r1–r8 form, kept for FEW columns where its
    row-count × column-count intermediate stays cheap and whole-stage
    codegen beats the Arrow path's fixed per-pass Python-worker cost.
    Bucket assignment is :func:`_bucket_expr` — the exact JVM twin of
    the numpy math in :func:`_multi_pass_arrow` (pure IEEE-double ops,
    always agree)."""
    inf = float("inf")
    structs = []
    for c, lo, width in specs:
        v = F.col(c).cast("double")
        fin = (
            v.isNotNull() & ~F.isnan(v) & (v != F.lit(inf)) & (v != F.lit(-inf))
        )
        if needed is None:
            k = _bucket_expr(v, lo, width).cast("double")
        else:
            b = _bucket_expr(v, lo, width)
            k = F.when(b.isin([int(x) for x in needed[c]]), v)
        structs.append(
            F.struct(F.lit(c).alias("c"), F.when(fin, k).alias("k"))
        )
    return (
        df.select(F.explode(F.array(*structs)).alias("s"))
        .select(F.col("s.c").alias("c"), F.col("s.k").alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy("c", "k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )


def _multi_pass_arrow(
    df: DataFrame,
    specs: list[tuple[str, float, float]],
    needed: dict[str, list[int]] | None,
):
    """Arrow transport: numpy ``bincount``/``unique`` partials per task,
    merged by a tiny (column, key) aggregation — the r9 form, kept for
    MANY columns where the explode's row-count × column-count
    intermediate rows dominate (at 25 profiled columns × 600k rows the
    two explode passes cost 10× the underlying scan: 4.9 s vs 1.1 s).
    Per-element ops are IEEE-identical to the JVM expression
    (``(v − lo) / width · B`` then ``floor`` then the B−1 clamp,
    exactly :func:`_bucket_of`), so the histogram is bit-equal, and the
    property suite that pins the engine against the builtin percentile
    covers it.

    r17: ``mapInArrow`` instead of ``mapInPandas`` — the numpy partials
    never needed pandas, and the pandas Series construction per (batch,
    column) was pure overhead on both sides of the boundary (guide §4.2;
    measured at 25 columns × 600k rows: 1.92 → 1.57 s per pass).
    ``Array.to_numpy(zero_copy_only=False)`` yields the identical
    float64 array (nulls → NaN) the pandas path produced, so the bucket
    math is bit-for-bit unchanged. The partials column ``c`` stays the
    COLUMN NAME (not an index) so the merged rows are drop-in for both
    callers."""
    import numpy as np
    import pyarrow as pa

    aliases = [(f"__q_{i}", c, lo, width) for i, (c, lo, width) in enumerate(specs)]
    sub = df.select(
        *[F.col(c).cast("double").alias(a) for a, c, _, _ in aliases]
    )
    B = N_BUCKETS
    need_arrs = (
        {c: np.asarray(bs, dtype=np.int64) for c, bs in needed.items()}
        if needed is not None
        else None
    )

    def gen(batches):
        for rb in batches:
            out_c: list = []
            out_k: list = []
            out_n: list = []
            for i, (a, c, lo, width) in enumerate(aliases):
                arr = rb.column(i).to_numpy(zero_copy_only=False)
                m = np.isfinite(arr)
                if not m.any():
                    continue
                vals = arr[m]
                b = np.minimum(
                    B - 1, np.floor((vals - lo) / width * B)
                ).astype(np.int64)
                if need_arrs is None:
                    cnt = np.bincount(b)
                    nz = np.flatnonzero(cnt)
                    ks, ns = nz.astype("float64"), cnt[nz]
                else:
                    sel = np.isin(b, need_arrs[c])
                    if not sel.any():
                        continue
                    # -0.0/+0.0 sign bits need no handling here: these
                    # partials feed the groupBy("c","k") below, whose
                    # NormalizeFloatingNumbers rule canonicalizes -0.0
                    # keys to +0.0 — the SAME normalizer the JVM
                    # transport's groupBy applies, so the transports
                    # agree on zero's sign regardless of column count
                    # (verified empirically in the r10 review; the
                    # dual-transport lockstep tests pin it)
                    ks, ns = np.unique(vals[sel], return_counts=True)
                out_c.append(np.full(len(ks), i, dtype=np.int64))
                out_k.append(ks)
                out_n.append(ns)
            if out_c:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(out_c), type=pa.int64()),
                        pa.array(np.concatenate(out_k), type=pa.float64()),
                        pa.array(np.concatenate(out_n), type=pa.int64()),
                    ],
                    names=["ci", "k", "cnt"],
                )

    names = [c for c, _, _ in specs]
    return [
        {"c": names[r["ci"]], "k": r["k"], "cnt": r["cnt"]}
        for r in (
            sub.mapInArrow(gen, "ci long, k double, cnt long")
            .groupBy("ci", "k")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        )
    ]


def _walk(rows, base: int, ks: Sequence[int], out: dict[int, float]) -> None:
    """Resolve ranks from sorted (value, count) pairs starting at global
    rank ``base`` (exclusive)."""
    acc = base
    for v, cnt in rows:
        for k in ks:
            if acc < k <= acc + cnt:
                out[k] = float(v)
        acc += cnt


def _kth_smallest(
    frame: DataFrame, ks: Sequence[int], lo: float, hi: float, base: int = 0
) -> dict[int, float]:
    """Exact k-th smallest values (1-based global ranks ``ks``) of the
    non-NaN double column ``v`` of ``frame``, whose values lie in
    [lo, hi] and which holds ranks base+1.. — by iterative bucket
    refinement. Every collect is ≤ max(N_BUCKETS, MAX_BOUNDARY_COLLECT)
    rows; skewed buckets recurse instead of collecting."""
    out: dict[int, float] = {}
    pending = [(tuple(ks), frame, lo, hi, base, 0)]
    while pending:
        ks_, fr, lo_, hi_, base_, depth = pending.pop()
        if lo_ == hi_:
            for k in ks_:
                out[k] = float(lo_)
            continue
        if depth >= MAX_DEPTH:  # pragma: no cover - degenerate FP ranges
            rows = [
                (r["v"], r["c"])
                for r in fr.groupBy("v").agg(F.count(F.lit(1)).alias("c")).orderBy("v").collect()
            ]
            _walk(rows, base_, ks_, out)
            continue
        width = hi_ - lo_
        b = _bucket_expr(F.col("v"), lo_, width)
        hist = {
            r["b"]: r["c"]
            for r in fr.groupBy(b.alias("b")).agg(F.count(F.lit(1)).alias("c")).collect()
        }
        buckets = sorted(hist)
        cum, acc = [], 0
        for j in buckets:
            acc += hist[j]
            cum.append(acc)
        by_bucket: dict[int, list[int]] = defaultdict(list)
        for k in ks_:
            i = bisect.bisect_left(cum, k - base_)
            by_bucket[i].append(k)
        collect_now = []
        for i, kk in by_bucket.items():
            j, start = buckets[i], (cum[i - 1] if i else 0)
            if hist[j] <= MAX_BOUNDARY_COLLECT:
                collect_now.append((j, start, kk))
            else:
                sub = fr.filter(_bucket_expr(F.col("v"), lo_, width) == j)
                sst = sub.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).first()
                pending.append((tuple(kk), sub, sst["lo"], sst["hi"], base_ + start, depth + 1))
        if collect_now:
            needed = [j for j, _, _ in collect_now]
            rows = (
                fr.filter(_bucket_expr(F.col("v"), lo_, width).isin(needed))
                .groupBy("v")
                .agg(F.count(F.lit(1)).alias("c"))
                .orderBy("v")
                .collect()
            )
            per_bucket: dict[int, list[tuple[float, int]]] = defaultdict(list)
            for r in rows:
                per_bucket[_bucket_of(r["v"], lo_, width)].append((r["v"], r["c"]))
            for j, start, kk in collect_now:
                _walk(per_bucket[j], base_ + start, kk, out)
    return out


def exact_quantiles_multi(
    df: DataFrame, col_probs: dict[str, Sequence[float]]
) -> dict[str, list[float]]:
    """Exact interpolated quantiles for SEVERAL columns in three jobs
    total (stats, histograms, boundary values) — see module docstring.
    Returns ``{col: [q for each prob]}``; empty columns yield NaN."""
    cols = list(col_probs)
    inf = float("inf")
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        nn = v.isNotNull() & ~F.isnan(v)
        fin = nn & (v != F.lit(inf)) & (v != F.lit(-inf))
        aggs += [
            F.count(F.when(v.isNotNull(), 1)).alias(f"__n_{c}"),
            F.min(F.when(fin, v)).alias(f"__lo_{c}"),
            F.max(F.when(fin, v)).alias(f"__hi_{c}"),
            F.count(F.when(fin, 1)).alias(f"__nf_{c}"),
            F.count(F.when(nn & (v == F.lit(-inf)), 1)).alias(f"__ni_{c}"),
            F.count(F.when(nn, 1)).alias(f"__nr_{c}"),
        ]
    st = df.agg(*aggs).first().asDict()

    def _region_value(c: str, k: int) -> float | None:
        """Value of rank k when it falls OUTSIDE the finite-selection
        window (IEEE sort order: -inf < finite < +inf < NaN), or None
        when selection must resolve it."""
        n_neg, n_fin, n_real = st[f"__ni_{c}"], st[f"__nf_{c}"], st[f"__nr_{c}"]
        if k <= n_neg:
            return -inf
        if k <= n_neg + n_fin:
            return None
        if k <= n_real:
            return inf
        return float("nan")

    # ranks each column needs resolved by selection — LOCAL ranks within
    # the finite window (global rank minus the -inf prefix); every other
    # region (±inf, NaN) resolves in closed form above
    specs: dict[str, list[tuple[int, int, float]]] = {}
    need: dict[str, list[int]] = {}
    for c, probs in col_probs.items():
        n = st[f"__n_{c}"] or 0
        sp, ks = [], set()
        for p in probs:
            if n == 0:
                sp.append((0, 0, 0.0))
                continue
            # the shared invariant-6 rank math (functions.rank_math):
            # 0-based position FIRST, then the 1-based flanking shift
            k0, k1, frac = rank_spec(n, p)
            sp.append((k0, k1, frac))
            ks.add(k0)
            # the upper flank is only read when interpolation happens —
            # skip resolving it for integral positions (saves a bucket
            # locate+collect whenever p lands exactly on a rank)
            if frac != 0.0:
                ks.add(k1)
        specs[c] = sp
        n_neg, lo, hi = st[f"__ni_{c}"], st[f"__lo_{c}"], st[f"__hi_{c}"]
        if st[f"__nf_{c}"] and lo != hi:
            need[c] = sorted(
                k - n_neg for k in ks if _region_value(c, k) is None
            )
        else:
            need[c] = []

    # one histogram job for every column that needs selection (Arrow
    # bincount partials — see _multi_pass for the measured rationale)
    hist_specs = [
        (c, st[f"__lo_{c}"], st[f"__hi_{c}"] - st[f"__lo_{c}"])
        for c in cols
        if need[c]
    ]
    hist: dict[tuple[str, int], int] = {}
    if hist_specs:
        for r in _multi_pass(df, hist_specs, None):
            hist[(r["c"], int(r["k"]))] = r["cnt"]

    # locate buckets; batch the well-behaved ones into ONE boundary job,
    # recurse per skewed bucket via _kth_smallest
    resolved: dict[str, dict[int, float]] = {c: {} for c in cols}
    boundary_need: dict[str, list[int]] = {}
    walk_plan: list[tuple[str, int, int, list[int]]] = []  # (col, bucket, start, ks)
    for c in cols:
        if not need[c]:
            continue
        lo, hi = st[f"__lo_{c}"], st[f"__hi_{c}"]
        width = hi - lo
        buckets = sorted(b for (cc, b) in hist if cc == c)
        cum, acc = [], 0
        for j in buckets:
            acc += hist[(c, j)]
            cum.append(acc)
        by_bucket: dict[int, list[int]] = defaultdict(list)
        for k in need[c]:
            by_bucket[bisect.bisect_left(cum, k)].append(k)
        v = F.col(c).cast("double")
        fin = (
            v.isNotNull() & ~F.isnan(v) & (v != F.lit(inf)) & (v != F.lit(-inf))
        )
        col_buckets: list[int] = []
        for i, kk in by_bucket.items():
            j, start = buckets[i], (cum[i - 1] if i else 0)
            if hist[(c, j)] <= MAX_BOUNDARY_COLLECT:
                walk_plan.append((c, j, start, kk))
                col_buckets.append(j)
            else:
                sub = df.filter(fin & (_bucket_expr(v, lo, width) == j)).select(
                    v.alias("v")
                )
                sst = sub.agg(F.min("v").alias("l"), F.max("v").alias("h")).first()
                resolved[c].update(
                    _kth_smallest(sub, kk, sst["l"], sst["h"], base=start)
                )
        if col_buckets:
            boundary_need[c] = col_buckets
    if boundary_need:
        # one boundary job for every column at once (the Arrow value
        # pass — bucket membership is decided task-side on the same
        # float64 bucket math; the driver-side walk regroups values by
        # bucket via _bucket_of exactly as before)
        bspecs = [
            (c, st[f"__lo_{c}"], st[f"__hi_{c}"] - st[f"__lo_{c}"])
            for c in cols
            if c in boundary_need
        ]
        rows = sorted(
            _multi_pass(df, bspecs, boundary_need),
            key=lambda r: (r["c"], r["k"]),
        )
        per_cb: dict[tuple[str, int], list[tuple[float, int]]] = defaultdict(list)
        for r in rows:
            c = r["c"]
            lo, hi = st[f"__lo_{c}"], st[f"__hi_{c}"]
            per_cb[(c, _bucket_of(r["k"], lo, hi - lo))].append((r["k"], r["cnt"]))
        for c, j, start, kk in walk_plan:
            _walk(per_cb[(c, j)], start, kk, resolved[c])

    out: dict[str, list[float]] = {}
    for c in cols:
        n = st[f"__n_{c}"] or 0
        n_neg, lo = st[f"__ni_{c}"], st[f"__lo_{c}"]

        def _value_at(k: int) -> float:
            region = _region_value(c, k)
            if region is not None:
                return region
            if need[c]:
                try:
                    return resolved[c][k - n_neg]
                except KeyError:
                    # a missing rank here means bucket location or
                    # recursion went wrong — fail loudly rather than
                    # degrade to a silently-wrong NaN (NaN results may
                    # only come from the closed-form NaN region)
                    raise AssertionError(
                        f"quantile engine: rank {k} (finite-window rank "
                        f"{k - n_neg}) of column {c!r} was never resolved"
                    ) from None
            # finite window exists but needed no selection: every
            # finite value equals lo (the lo == hi degenerate case)
            return float(lo)

        res = []
        for k0, k1, frac in specs[c]:
            if n == 0:
                res.append(float("nan"))
                continue
            # frac == 0 short-circuits BEFORE _value_at(k1): rank k0 IS
            # the target, AND the upper flank was deliberately never
            # resolved for integral positions (see the `ks.add` above) —
            # rank_math.interp's own guard cannot give that back
            v0 = _value_at(k0)
            if frac == 0.0:
                res.append(v0)
                continue
            # the shared symmetric interpolation (invariant 6 — see
            # functions.rank_math for the cancellation/±inf rationale)
            res.append(interp(v0, _value_at(k1), frac))
        out[c] = res
    return out


def exact_quantiles(
    df: DataFrame, value_col: str, probs: Sequence[float]
) -> list[float]:
    """Exact interpolated quantiles of ``value_col`` (nulls ignored,
    NaN ranks last), computed without any single-node value buffer."""
    return exact_quantiles_multi(df, {value_col: probs})[value_col]
