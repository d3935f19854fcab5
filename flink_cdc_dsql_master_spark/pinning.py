"""Centralized intermediate-result pinning (ADVICE r7).

Iterative and multi-consumer operators (pagerank, k-means, MinHash-LSH,
BPE, greedy cover, ...) must truncate lineage each round or the nested
plan grows without bound. On a single node ``localCheckpoint`` is the
right tool: blocks are GC-reclaimable with the result and there is no
lineage left to recompute. On a REAL cluster, localCheckpoint stores
*unreplicated* blocks AND discards lineage — one lost executor makes the
job unrecoverable. That trade-off must be a deployment choice, not a
per-operator hardcode, so every operator pins through :func:`pin` and a
cluster deployment flips ONE conf:

    spark.conf.set(PIN_MODE_CONF, "persist")      # recomputable (lineage
                                                  # kept; plans grow)
    spark.conf.set(PIN_MODE_CONF, "checkpoint")   # reliable: replicated to
                                                  # the checkpoint dir
                                                  # (sc.setCheckpointDir)
    # default: "localCheckpoint"                  # single-node / local[N]

Usage is postfix so call sites keep their chain shape:
``df.transform(pin)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PIN_MODE_CONF = "spark.flinkCdcDsql.pinMode"
_MODES = ("localCheckpoint", "persist", "checkpoint")


def pin(df: DataFrame) -> DataFrame:
    """Pin an intermediate DataFrame per the session's ``PIN_MODE_CONF``.

    localCheckpoint (default) = eager, lineage-truncating, unreplicated;
    persist = lazy cache, lineage kept (cluster-safe but plans grow);
    checkpoint = eager, reliable storage (requires a checkpoint dir).
    """
    mode = df.sparkSession.conf.get(PIN_MODE_CONF, "localCheckpoint")
    if mode not in _MODES:
        raise ValueError(
            f"{PIN_MODE_CONF}={mode!r}: expected one of {_MODES}")
    if mode == "persist":
        return df.persist()
    if mode == "checkpoint":
        return df.checkpoint(eager=True)
    return df.localCheckpoint()


def pin_eager(df: DataFrame) -> DataFrame:
    """Pin with a HARD eagerness requirement: the result must never be
    recomputable from its input lineage, because the caller is about to
    invalidate that input (ADVICE r8: ``DbApiPollingSource.poll`` swaps
    the snapshot directory its diff was computed against immediately
    after pinning — under the lazy 'persist' mode the diff would
    evaluate, or recompute after block eviction, against the NEW
    snapshot and emit silently wrong changelog batches).

    'persist' therefore maps to reliable ``checkpoint()`` when a
    checkpoint dir is configured, else ``localCheckpoint()`` — trading
    cluster recoverability (a lost executor fails the poll, which is
    retried) for correctness (never a wrong diff)."""
    mode = df.sparkSession.conf.get(PIN_MODE_CONF, "localCheckpoint")
    if mode not in _MODES:
        raise ValueError(
            f"{PIN_MODE_CONF}={mode!r}: expected one of {_MODES}")
    if mode == "checkpoint" or (
            mode == "persist"
            and df.sparkSession.sparkContext.getCheckpointDir() is not None):
        return df.checkpoint(eager=True)
    return df.localCheckpoint()
