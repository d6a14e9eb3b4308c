"""Multi-column Z-order (Morton-order) clustering expression.

``zorder_value(df, cols)`` returns a bigint Column that interleaves the
bits of the given columns so that sorting by it co-locates rows that
are close in EVERY dimension at once. Lexicographic range clustering
(``repartitionByRange(a, b)``) gives tight per-file min/max ranges
only for the leading column; a Z-order layout gives each file a narrow
range in *all* clustered columns, so parquet footer min/max stats
prune files for predicates on any clustered column — the OPTIMIZE
... ZORDER BY analogue (Delta OSS implements the same idea via
range-partition IDs; reference has no layout management at all).

Spark-first: everything below is built-in column expressions (one
bounded ``collect()`` for per-column min/max — 2 scalars per column),
so the z-value computation stays inside whole-stage codegen; the
interleave is a sum of shift/mask terms over 16-bit normalized keys.

Normalization per column dtype:
- numeric/date/timestamp: min/max-scaled to [0, 65535]. Linear
  scaling preserves order exactly; equal-width buckets are fine for
  layout purposes (skew only makes some z-cells denser, never breaks
  pruning correctness, since pruning reads the REAL column stats).
- string: order-preserving 4-byte prefix integer (big-endian byte
  value of the first 4 characters), then min/max-scaled. Preserves
  lexicographic order of the prefix; collisions beyond 4 chars only
  coarsen locality.

NULLs map to bucket 0 (sorts first, like NULLS FIRST).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_BITS = 16
_MAX = (1 << _BITS) - 1

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def _prefix_int(col: Column) -> Column:
    """Order-preserving integer of a string's first 4 bytes."""
    out = F.lit(0).cast("bigint")
    for i in range(1, 5):
        byte = F.coalesce(F.ascii(F.substring(col, i, 1)), F.lit(0))
        out = out * F.lit(256) + byte.cast("bigint")
    return out


def _as_orderable_double(col: Column, dtype: str) -> Column:
    if dtype in _NUMERIC or dtype.startswith("decimal"):
        return col.cast("double")
    if dtype in ("date", "timestamp", "timestamp_ntz"):
        # session TZ is pinned UTC — exact (see functions.portable.umicros)
        return F.unix_micros(col.cast("timestamp")).cast("double")
    if dtype == "string":
        return _prefix_int(col).cast("double")
    raise ValueError(f"zorder: unsupported column type {dtype!r}")


def _bucket_columns(df: DataFrame, cols: list[str]) -> tuple[list[Column], int]:
    """Shared normalization for space-filling-curve layouts: each
    column min/max-scaled into ``bits``-bit buckets (one tiny stats
    job — 2×len(cols) scalars to the driver, metadata-bounded).

    The curve value must stay inside the non-negative bigint range:
    the highest bit written is bits*n - 1, which must be <= 62 (bit 63
    is the sign; shifts >= 64 wrap mod 64 in the JVM and would
    scramble the interleave entirely). With the default 16 bits that
    caps out at 3 columns; wider clusterings trade per-column
    resolution for dimensionality."""
    dtypes = dict(df.dtypes)
    ordered = {c: _as_orderable_double(F.col(c), dtypes[c]) for c in cols}
    stats = df.agg(
        *[F.min(e).alias(f"mn_{c}") for c, e in ordered.items()],
        *[F.max(e).alias(f"mx_{c}") for c, e in ordered.items()],
    ).head()

    n = len(cols)
    bits = min(_BITS, 63 // n)
    vmax = (1 << bits) - 1

    buckets: list[Column] = []
    for c, e in ordered.items():
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None or mx == mn:
            buckets.append(F.lit(0).cast("bigint"))
            continue
        scaled = (e - F.lit(float(mn))) / F.lit(float(mx) - float(mn)) * F.lit(vmax)
        b = F.least(F.greatest(F.round(scaled, 0), F.lit(0.0)), F.lit(float(vmax)))
        buckets.append(F.coalesce(b.cast("bigint"), F.lit(0).cast("bigint")))
    return buckets, bits


def zorder_value(df: DataFrame, cols: list[str]) -> Column:
    """Build the interleaved z-value Column for ``df[cols]``.

    One tiny job computes per-column min/max (2×len(cols) scalars to
    the driver — metadata-bounded, scale-safe); the returned Column is
    pure built-in expressions evaluated at write time.
    """
    buckets, bits = _bucket_columns(df, cols)
    n = len(cols)
    z = F.lit(0).cast("bigint")
    for bit in range(bits):
        for i, b in enumerate(buckets):
            z = z + F.shiftleft(
                F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * n + i
            ).cast("bigint")
    return z


def hilbert_axes_to_index(xmat, bits: int):
    """Vectorized Skilling transform (J. Skilling, "Programming the
    Hilbert curve", AIP Conf. Proc. 707, 2004): map an (n, d) int
    matrix of ``bits``-bit coordinates to the (n,) Hilbert index.
    Pure numpy — shared by the Spark UDF and the tests' reference."""
    import numpy as np

    X = [xmat[:, i].astype("int64").copy() for i in range(xmat.shape[1])]
    d = len(X)
    M = 1 << (bits - 1)
    Q = M
    while Q > 1:
        P = Q - 1
        for i in range(d):
            cond = (X[i] & Q) != 0
            t = (X[0] ^ X[i]) & P  # for i == 0 this is 0 (no-op branch)
            x0_true, x0_false = X[0] ^ P, X[0] ^ t
            xi_false = X[i] ^ t
            new_x0 = np.where(cond, x0_true, x0_false)
            if i > 0:
                X[i] = np.where(cond, X[i], xi_false)
            X[0] = new_x0
        Q >>= 1
    for i in range(1, d):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    Q = M
    while Q > 1:
        t = np.where((X[d - 1] & Q) != 0, t ^ (Q - 1), t)
        Q >>= 1
    for i in range(d):
        X[i] ^= t
    h = np.zeros_like(X[0])
    for j in range(bits - 1, -1, -1):
        for i in range(d):
            h = (h << 1) | ((X[i] >> j) & 1)
    return h


def hilbert_value(df: DataFrame, cols: list[str]) -> Column:
    """Hilbert-curve index Column over ``df[cols]`` — the step up from
    Z-order when locality binds: every unit step along the Hilbert
    curve moves exactly one bucket in one dimension (no Morton
    "seams" where the curve jumps across the space), so file ranges
    along the sort are tighter on average for the same bit budget
    (Databricks liquid clustering uses the same curve for the same
    reason).

    Implementation note: the Skilling transform is ~bits×d dependent
    conditional bit-steps; unrolling it into Column expressions (the
    Morton approach) multiplies the X0 subtree per step — the
    expression tree grows exponentially and breaks codegen. A layout
    rewrite is a one-time maintenance pass, so this takes the
    documented Python-unavoidable path instead: Arrow-batched numpy
    over the SAME bucketed coordinates the Z-order expression uses
    (bucketing itself stays JVM-side).
    """
    buckets, bits = _bucket_columns(df, cols)

    def _hidx(arr):
        import numpy as np
        import pandas as pd

        xmat = np.stack(arr.to_numpy())
        return pd.Series(hilbert_axes_to_index(xmat, bits))

    hidx = F.pandas_udf(_hidx, "long")
    return hidx(F.array(*buckets))


def _layout(df: DataFrame, cols: list[str], strategy: str, n_files: int):
    """The same three layouts txlog's ``cluster`` writes (range /
    zorder / hilbert), as a repartitioned DataFrame."""
    if strategy == "range":
        key = [F.col(c) for c in cols]
        return df.repartitionByRange(n_files, *key).sortWithinPartitions(*key)
    curve = zorder_value if strategy == "zorder" else hilbert_value
    return (
        df.withColumn("__cv", curve(df, cols))
        .repartitionByRange(n_files, F.col("__cv"))
        .sortWithinPartitions("__cv")
        .drop("__cv")
    )


def pruning_report(
    df: DataFrame,
    cols: list[str],
    predicates: dict[str, dict[str, tuple]],
    out_dir: str,
    n_files: int = 32,
    strategies: tuple[str, ...] = ("range", "zorder", "hilbert"),
) -> dict:
    """Measure what each clustering strategy actually buys: write the
    SAME table under each layout, read back the per-file parquet
    footer min/max for the clustered columns, and count the files a
    stats-based reader must touch for each box predicate
    (``{"name": {col: (lo, hi), ...}}`` — a file qualifies iff its
    [min,max] overlaps the box on EVERY predicate column; missing
    stats force a read).

    This is the skipping the txlog MERGE/DELETE planner and any
    Delta-style reader performs, so "files touched / total" is the
    honest pruning number (not an assertion that one curve is better).
    Returns ``{strategy: {pred_name: files_read}, "total_files": n}``.
    """
    import os

    import pyarrow.parquet as pq

    report: dict = {"predicates": sorted(predicates)}
    for strategy in strategies:
        path = os.path.join(out_dir, f"layout_{strategy}")
        _layout(df, cols, strategy, n_files).write.mode("overwrite").parquet(
            path
        )
        files = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
        # report the file count actually written, not the requested
        # n_files — repartitionByRange may coalesce empty ranges, and
        # the three strategies range-partition on DIFFERENT keys (raw
        # tuples vs interleaved curve values), so their non-empty
        # counts can legitimately differ on low-cardinality or skewed
        # inputs. Record per-strategy counts; total_files keeps the
        # first strategy's count for single-denominator consumers.
        report.setdefault("files_written", {})[strategy] = len(files)
        report.setdefault("total_files", len(files))
        stats = []  # per file: {col: (min, max) | None}
        for fp in files:
            md = pq.ParquetFile(fp).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            per: dict = {}
            for c in cols:
                lo = hi = None
                ok = True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(names[c]).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                per[c] = (lo, hi) if ok else None
            stats.append(per)
        counts = {}
        for pname, box in predicates.items():
            n_read = 0
            for per in stats:
                hit = True
                for c, (lo, hi) in box.items():
                    mm = per.get(c)
                    if mm is None:
                        continue  # no stats: must read
                    if mm[0] > hi or mm[1] < lo:
                        hit = False
                        break
                if hit:
                    n_read += 1
            counts[pname] = n_read
        report[strategy] = counts
    return report
