"""Aggregate-navigator: answer group-by queries from maintained
aggregate views (operators/ivm.AggregateView) instead of the base
table whenever a registered view covers the request.

This is the classic OLAP summary-table / materialized-view rewrite
(Mondrian aggregate tables, Druid/Pinot rollup segments, warehouse MV
query rewrite): a request for ``GROUP BY dims : measures`` is served
by re-aggregating a view whose key set is a SUPERSET of ``dims`` and
whose maintained measures can derive every requested measure:

- ``count(*)``        -> ``SUM(n_rows)``       (always available)
- ``sum(c)``          -> ``SUM(sum_c)``        when ``c`` in view sums
- ``avg(c)``          -> ``SUM(sum_c)/SUM(n_rows)`` (exact: decimal
  sum, one double division — identical to computing over the base).
  NOTE: the view tracks the GROUP row count, not per-column non-null
  counts, so the derived average divides by all rows; for a column
  with NULLs this differs from SQL ``AVG`` (which skips NULLs). The
  base fallback uses the same division so routed and fallback answers
  always agree; request ``sum`` + ``count`` and divide yourself if
  you need NULL-skipping semantics over nullable measures.
- ``min(c)/max(c)``   -> ``MIN(min_c)/MAX(max_c)`` when ``c`` in the
  view's minmax set

At 100 TB this is the difference between an O(rows) fact scan and an
O(groups) read of a maintained aggregate: the view is kept fresh
incrementally from the change feed (O(delta) per refresh, see ivm.py),
so routed queries never touch the base table at all. The router
re-aggregates the view frame — group counts, not row counts — and the
roll-up itself is one map-side-combinable hash aggregate over a frame
that is already tiny by construction.

Routing is CORRECT BY ALGEBRA, not by sampling: counts and decimal
sums are distributive, min/max are semi-lattice merges, and avg is
derived algebraically from (sum, count) — the same roll-up identities
the view refresh relies on. A measure outside this algebra (e.g.
countDistinct) is NOT derivable from the maintained state; the router
then falls back to the base table, never approximates.

Staleness policy: a view that is behind its base (``staleness() > 0``)
is refreshed first when ``refresh="stale"`` (default — routed answers
are then exactly base-fresh), served as-is when ``allow_stale=True``
(the monitoring-dashboard trade), and skipped in favor of the base
scan otherwise.

No analogous operator exists in the reference engine — this extends
its query surface with the standard warehouse aggregate-routing
capability, built on the txlog IVM views.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from x_spark.operators.ivm import AggregateView

_DERIVABLE_OPS = ("count", "sum", "avg", "min", "max")


@dataclass(frozen=True)
class Measure:
    """One requested measure: ``op`` in count/sum/avg/min/max, ``col``
    the base column (None for count), ``alias`` the output name."""

    op: str
    col: str | None = None
    alias: str | None = None

    def __post_init__(self):
        if self.op not in _DERIVABLE_OPS:
            raise ValueError(f"unsupported measure op: {self.op!r}")
        if self.op != "count" and not self.col:
            raise ValueError(f"measure {self.op!r} requires a column")

    @property
    def out_name(self) -> str:
        if self.alias:
            return self.alias
        return "n_rows" if self.op == "count" else f"{self.op}_{self.col}"


@dataclass(frozen=True)
class Routed:
    """Routing outcome: the result frame plus where it came from
    (``"view:<name>"`` or ``"base"``) — callers and tests assert on
    ``served_from`` instead of sniffing plans."""

    df: DataFrame
    served_from: str


class ViewRouter:
    """Routes aggregate requests over ONE base table across its
    registered maintained views; falls back to the base scan when no
    view covers the request."""

    def __init__(self, ds, base_ref):
        self.ds = ds
        self.base_ref = base_ref
        self._views: dict[str, AggregateView] = {}

    def register(self, name: str, view: AggregateView) -> None:
        if view.base_ref is not self.base_ref and view.base_ref != self.base_ref:
            raise ValueError("view is maintained over a different base table")
        self._views[name] = view

    # -- coverage ------------------------------------------------------
    @staticmethod
    def _covers(view: AggregateView, dims: list[str],
                measures: list[Measure],
                filter_cols: set[str] | None = None) -> bool:
        if not set(dims) <= set(view.keys):
            return False
        if filter_cols and not filter_cols <= set(view.keys):
            # a predicate over KEY columns commutes with the roll-up
            # (every base row of a group shares its key values), so
            # filtering the view frame == filtering the base; any
            # other column makes the request non-derivable
            return False
        for m in measures:
            if m.op == "count":
                continue
            if m.op in ("sum", "avg") and m.col not in view.sums:
                return False
            if m.op in ("min", "max") and m.col not in view.minmax:
                return False
        return True

    def _pick(self, dims: list[str], measures: list[Measure],
              filter_cols: set[str] | None = None,
              ) -> tuple[str, AggregateView] | None:
        """Cheapest covering view: fewest group keys (smallest frame —
        the cardinality of a maintained aggregate is monotone in its
        key set). Ties break on registration order."""
        best = None
        for name, view in self._views.items():
            if self._covers(view, dims, measures, filter_cols):
                if best is None or len(view.keys) < len(best[1].keys):
                    best = (name, view)
        return best

    # -- rewrites ------------------------------------------------------
    @staticmethod
    def _view_aggs(measures: list[Measure]) -> list[F.Column]:
        out = []
        for m in measures:
            if m.op == "count":
                out.append(F.sum("n_rows").cast("bigint").alias(m.out_name))
            elif m.op == "sum":
                out.append(
                    F.sum(f"sum_{m.col}").cast("decimal(30,6)").alias(m.out_name)
                )
            elif m.op == "avg":
                out.append(
                    (F.sum(f"sum_{m.col}").cast("double")
                     / F.sum("n_rows")).alias(m.out_name)
                )
            elif m.op == "min":
                out.append(F.min(f"min_{m.col}").alias(m.out_name))
            else:
                out.append(F.max(f"max_{m.col}").alias(m.out_name))
        return out

    @staticmethod
    def _base_aggs(measures: list[Measure]) -> list[F.Column]:
        """Base-scan fallback with IDENTICAL semantics and types to the
        view path (decimal-exact sums, one-division averages) — routed
        and fallback answers are interchangeable, pinned by test."""
        out = []
        for m in measures:
            if m.op == "count":
                out.append(F.count("*").cast("bigint").alias(m.out_name))
            elif m.op == "sum":
                out.append(
                    F.sum(F.col(m.col).cast("decimal(30,6)"))
                    .cast("decimal(30,6)").alias(m.out_name)
                )
            elif m.op == "avg":
                # divide by count(*), not count(col): matches the view
                # derivation (see module docstring NULL note) so the
                # two paths are interchangeable answer-for-answer
                out.append(
                    (F.sum(F.col(m.col).cast("decimal(30,6)")).cast("double")
                     / F.count("*")).alias(m.out_name)
                )
            elif m.op == "min":
                out.append(F.min(m.col).alias(m.out_name))
            else:
                out.append(F.max(m.col).alias(m.out_name))
        return out

    def route(self, dims: list[str], measures: list[Measure], *,
              refresh: str = "stale", allow_stale: bool = False,
              where: str | None = None,
              where_cols: set[str] | None = None) -> Routed:
        """Serve ``GROUP BY dims : measures`` (optionally with a
        ``WHERE`` predicate over view-KEY columns — the one filter
        class that commutes with the roll-up).

        ``where`` is a SQL predicate string applied identically on
        both paths; ``where_cols`` MUST name every column it
        references (the router verifies coverage against this set —
        callers that cannot enumerate the columns must not pass a
        filter). ``refresh``: ``"stale"`` refreshes a behind view
        before serving (O(delta)); ``"never"`` refuses stale views
        (falls back to the base unless ``allow_stale``). ``"always"``
        refreshes even when the staleness probe says fresh (paranoid
        mode for externally mutated logs).
        """
        if refresh not in ("stale", "never", "always"):
            raise ValueError(f"unknown refresh policy: {refresh!r}")
        if where is not None and not where_cols:
            raise ValueError("where requires where_cols naming its columns")
        picked = self._pick(dims, measures, where_cols if where else None)
        if picked is not None:
            name, view = picked
            if refresh == "always":
                view.refresh()
            elif view.staleness() > 0:
                if refresh == "stale":
                    view.refresh()
                elif not allow_stale:
                    picked = None
        if picked is None:
            base = self.ds.read(self.base_ref)
            if where is not None:
                base = base.filter(F.expr(where))
            grouped = base.groupBy(*dims) if dims else base.groupBy()
            return Routed(grouped.agg(*self._base_aggs(measures)), "base")
        name, view = picked
        frame = view.read()
        if where is not None:
            frame = frame.filter(F.expr(where))
        grouped = frame.groupBy(*dims) if dims else frame.groupBy()
        return Routed(grouped.agg(*self._view_aggs(measures)), f"view:{name}")
