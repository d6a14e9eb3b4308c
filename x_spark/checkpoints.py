"""Deterministic lifetime for ``localCheckpoint`` blocks.

Checkpoint blocks are NOT covered by ``spark.catalog.clearCache()``
and otherwise linger until the JVM garbage-collects the RDD handle —
in a long session (a 140-query bench, a multi-job pipeline) stale
generations accumulate in the block manager and degrade every later
job (measured on the components queries: 2x slower late in a bench
session before explicit cleanup). The shared contract:

- :func:`tracked_ckpt` pins a frame and returns the persistent-RDD
  ids it registered, so the OWNER of the frame's lifetime can free
  them the moment the last job consuming the checkpoint finishes.
- :func:`free_ckpts` unpersists them, tolerating already-freed ids
  and concurrent sessions.

Freeing is the caller's responsibility because only the caller knows
when the last consumer ran — a checkpointed frame's lineage is
TRUNCATED, so blocks must never be dropped while a derived plan still
needs them (which rules out object-lifetime finalizers: a derived
DataFrame does not keep a Python reference to its parent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["tracked_ckpt", "free_ckpts"]


def tracked_ckpt(df: DataFrame) -> tuple[DataFrame, list]:
    """``localCheckpoint(eager=True)`` plus the ids of the persistent
    RDDs it registered. If a concurrent job registered blocks in the
    same window the ids cannot be attributed — tracking is skipped
    (empty list) rather than guessed, and those blocks age out via
    JVM GC as before."""
    sc = df.sparkSession.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet())
    out = df.localCheckpoint(eager=True)
    new = [k for k in sc._jsc.getPersistentRDDs().keySet()
           if k not in before]
    return out, (new if len(new) == 1 else [])


def free_ckpts(spark, ids: list) -> None:
    """Unpersist the tracked blocks; safe on already-freed ids and on
    a stopped context (best-effort by design — the fallback is the
    same JVM-GC reaping that existed before tracking)."""
    try:
        for rdd_id in ids:
            j = spark.sparkContext._jsc.getPersistentRDDs().get(rdd_id)
            if j is not None:
                j.unpersist()
    except Exception:  # noqa: BLE001 - context shutdown race
        pass
