"""Custom stateful streaming operators — applyInPandasWithState.

The north-star extension beyond the reference (SURVEY §2.14): arbitrary
per-key state machines over an event stream.  Shipped operator:
``running_user_totals`` — per-user running aggregate state (count, sum,
last-seen event time), updated per micro-batch, emitted as the current
totals.  The state contract is the interesting part; the arithmetic is
deliberately simple and oracle-checkable (a drained finite stream must
equal the batch groupBy).

Scale: state lives in the state store keyed by user_id — partitioned by
the shuffle hash, bounded by key cardinality; each micro-batch touches
only the keys present in that batch (Arrow-batched pandas transfer).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: (count, value_sum) per user
_STATE_SCHEMA = "n LONG, value_sum DOUBLE"
_OUTPUT_SCHEMA = "user_id LONG, n_events LONG, value_sum DOUBLE"


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, vsum = state.get
    else:
        n, vsum = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        vsum += float(pdf["value"].fillna(0.0).sum())
    state.update((n, vsum))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "value_sum": [round(vsum, 4)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals as an applyInPandasWithState operator.

    Emits the current (count, sum) for every user seen in each
    micro-batch; over a drained finite stream the final emission per
    user equals the batch ``groupBy(user_id).agg(count, sum)``.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


#: CUSUM state: running sum of (value - k) and its prefix minimum
_CUSUM_STATE_SCHEMA = "c DOUBLE, minc DOUBLE"
_CUSUM_OUTPUT_SCHEMA = "event_id LONG, user_id LONG, cusum DOUBLE"


def running_cusum(events: DataFrame, k: float = 55.0) -> DataFrame:
    """Per-user streaming CUSUM drift statistic — the stateful twin
    of ``operators.temporal.cusum_drift``: state carries the running
    sum ``C`` of ``(value - k)`` and its prefix minimum, each event
    emits ``S = C - min_prefix(C)`` (the closed form of the
    ``max(0, S + x - k)`` recursion).

    ORDER-SENSITIVE state contract (unlike the order-free count/sum
    sinks in this module): events must arrive per-key in event-time
    order across micro-batches; within a batch the group sorts by
    ``(ts, event_id)`` before folding.  Every arithmetic step is the
    same IEEE double op sequence the batch window accumulator runs,
    so a drained in-order finite stream is value-identical to the
    batch operator (and to its SQL oracle).  Emits RAW doubles —
    round in the caller (Python round is half-even, the round-8
    lesson).

    Scale: O(2 doubles) state per key in the state store; each
    micro-batch touches only its keys.
    """
    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            c, minc = state.get
        else:
            # minc starts at 0.0 (the empty prefix C_0 = 0), matching
            # the batch closed form S_t = C_t - min(0, min C_i): a
            # series whose running sum stays positive from the first
            # event must emit x_1 - k, not 0.
            c, minc = 0.0, 0.0
        ids, ss = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, v in zip(pdf["event_id"], pdf["value"]):
                c = c + (float(v) - k)
                if c < minc:
                    minc = c
                ids.append(int(eid))
                ss.append(c - minc)
        state.update((c, minc))
        yield pd.DataFrame({"event_id": ids,
                            "user_id": [user_id] * len(ids),
                            "cusum": ss})

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_CUSUM_OUTPUT_SCHEMA,
            stateStructType=_CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


#: EMA ring state: the last (window - 1) values, newest LAST
_EMA_STATE_SCHEMA = "vals ARRAY<DOUBLE>"
_EMA_OUTPUT_SCHEMA = "event_id LONG, user_id LONG, ema DOUBLE"


def running_ema(events: DataFrame, alpha: float = 0.25,
                window: int = 16) -> DataFrame:
    """Per-user streaming EMA — the stateful twin of
    ``operators.temporal.ema_smooth``: state is a ring of the last
    ``window - 1`` values; each event emits the weighted mean of
    itself and the ring with weights ``(1 - alpha)^i`` (i = age).

    Same ORDER-SENSITIVE contract as :func:`running_cusum` (per-key
    event-time order across micro-batches; in-batch sort by
    ``(ts, event_id)``).  The fold iterates ages 0..k in the same
    order as the batch operator's unrolled lag terms, and absent lags
    contribute exact 0.0 there — adding 0.0 is an IEEE identity for
    these positive terms — so the drained stream is value-identical
    to batch and to its SQL oracle.  Emits RAW doubles.

    Scale: O(window) doubles of state per key.
    """
    decay = 1.0 - alpha
    weights = [decay ** i for i in range(window)]

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ring: list[float] = list(state.get[0]) if state.exists else []
        ids, emas = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, v in zip(pdf["event_id"], pdf["value"]):
                x = float(v)
                num = weights[0] * x
                den = weights[0]
                for i in range(1, min(window, len(ring) + 1)):
                    num = num + weights[i] * ring[-i]
                    den = den + weights[i]
                ids.append(int(eid))
                emas.append(num / den)
                ring.append(x)
                if len(ring) >= window:
                    ring = ring[-(window - 1):]
        state.update((ring,))
        yield pd.DataFrame({"event_id": ids,
                            "user_id": [user_id] * len(ids),
                            "ema": emas})

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_EMA_OUTPUT_SCHEMA,
            stateStructType=_EMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


#: Holt ring state: the last (window - 1) values, newest LAST
_HOLT_STATE_SCHEMA = "vals ARRAY<DOUBLE>"
_HOLT_OUTPUT_SCHEMA = ("event_id LONG, user_id LONG, "
                       "holt_level DOUBLE, holt_trend DOUBLE, "
                       "holt_forecast DOUBLE")


def running_holt(events: DataFrame, alpha: float = 0.5,
                 beta: float = 0.25, window: int = 12) -> DataFrame:
    """Per-user streaming Holt linear-trend smoothing — the stateful
    twin of ``operators.temporal.holt_smooth``: state is a ring of
    the last ``window - 1`` values; each event emits level/trend/
    forecast as the same fixed FIR taps (``holt_coefficients``) in
    the SAME fold order as the batch operator's unrolled lags.

    Same ORDER-SENSITIVE contract as :func:`running_ema` (per-key
    event-time order across micro-batches; in-batch sort by
    ``(ts, event_id)``).  Events before the window fills emit NULLs
    (the batch full-window contract), so the drained in-order stream
    is value-identical to batch and shares its SQL oracle.  Emits
    RAW doubles.

    Scale: O(window) doubles of state per key.
    """
    from xcube_spark.operators.temporal import holt_coefficients

    li, bi = holt_coefficients(alpha, beta, window)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ring: list[float] = list(state.get[0]) if state.exists else []
        ids, levs, tres, fcs = [], [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, v in zip(pdf["event_id"], pdf["value"]):
                x = float(v)
                ids.append(int(eid))
                if len(ring) >= window - 1:
                    lev = li[0] * x
                    tre = bi[0] * x
                    for i in range(1, window):
                        lev = lev + li[i] * ring[-i]
                        tre = tre + bi[i] * ring[-i]
                    levs.append(lev)
                    tres.append(tre)
                    fcs.append(lev + tre)
                else:
                    levs.append(None)
                    tres.append(None)
                    fcs.append(None)
                ring.append(x)
                if len(ring) >= window:
                    ring = ring[-(window - 1):]
        state.update((ring,))
        yield pd.DataFrame({"event_id": ids,
                            "user_id": [user_id] * len(ids),
                            "holt_level": levs,
                            "holt_trend": tres,
                            "holt_forecast": fcs})

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_HOLT_OUTPUT_SCHEMA,
            stateStructType=_HOLT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
