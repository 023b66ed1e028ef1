"""Arbitrary stateful streaming (SURVEY.md §2b "stateful arbitrary op").

The reference's only state is what ``reduceByKeyAndWindow`` keeps
internally (``main.scala:47``). Structured Streaming generalizes to
user-defined per-key state via ``applyInPandasWithState``: the engine's
example operator keeps one running counter per ``user_id`` and emits the
cumulative count each micro-batch.

Equivalence property (what the oracle checks): after draining a bounded
source, the LAST emission per key equals the plain batch
``groupBy(user_id).count()`` — state accumulated incrementally across
micro-batches must converge to the batch answer.

Scale: state lives in the executor-side state store partitioned by
grouping key (RocksDB-backed in production config); a 1000-executor
cluster shards users horizontally, and the Arrow batch transfer keeps
the Python hop vectorized.

Serialization contract: every state-update function is NESTED inside
its public wrapper, so cloudpickle ships it BY VALUE (with its
referenced constants) instead of by module reference — executors never
need this package importable on their own sys.path. A vanilla-session
driver rehearsal caught the by-reference form failing with
ModuleNotFoundError in exactly the environments where the engine is
loaded from a file path rather than an installed package.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("n", T.LongType())])


def running_count_per_user(events: DataFrame) -> DataFrame:
    """Streaming DataFrame of cumulative per-user event counts.

    ``events`` must be a streaming DataFrame with a ``user_id`` column.
    Emits one (user_id, n_events) row per key per micro-batch in
    ``update`` mode; no timeout (counters live for the query lifetime —
    a production TTL would use ``GroupStateTimeout.EventTimeTimeout``).
    """
    def _update_running_count(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Fold this batch's rows for one user into the persistent counter."""
        (user_id,) = key
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n]})

    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_count,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("last_ms", T.LongType()),
    ]
)

#: Session gap for timeout_session_summary (event-time ms).
SESSION_GAP_MS = 30 * 60 * 1000


def timeout_session_summary(events: DataFrame) -> DataFrame:
    """Sessions closed by EVENT-TIME TIMEOUT: one summary row per
    (user, session) emitted only when the watermark passes the last
    event + 30 min — the state-TTL pattern that keeps a 100 TB
    stateful job's store bounded (keys that go quiet are flushed and
    REMOVED, not retained forever like running_count_per_user's
    lifetime counters).

    ``events`` must already carry ``withWatermark("ts", ...)``.
    Sessions still open when a bounded drain ends are deliberately
    withheld (their timeout never fired) — the append-mode contract.
    Sessions are split on >gap idle stretches WITHIN a batch too
    (round-11 streaming review: the first cut lumped a user's whole
    batch into one session, so two bursts hours apart arriving in the
    same micro-batch summarized as one — the timeout only bounds the
    LAST burst; intra-batch gaps close immediately as 'gap' rows,
    same machine as ttl_sessionize).
    """
    def _update_session(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Close a session when the watermark passes last-event + gap;
        split immediately on in-batch gaps."""
        (user_id,) = key
        if state.hasTimedOut:
            n, _last = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "closed_by": ["timeout"],
                }
            )
            return
        ts_ms: list[int] = []
        for pdf in pdf_iter:
            if len(pdf):
                ts_ms.extend(int(v.value // 1_000_000) for v in pdf["ts"])
        ts_ms.sort()
        n, last_ms = (state.get if state.exists else (0, 0))
        closed_counts: list[int] = []
        for t_ in ts_ms:
            if n and t_ - last_ms > SESSION_GAP_MS:
                closed_counts.append(n)
                n = 0
            n += 1
            last_ms = max(last_ms, t_)
        state.update((n, last_ms))
        # Event-time timeout: fires once the WATERMARK (not wall clock)
        # passes last event + gap — deterministic under availableNow.
        state.setTimeoutTimestamp(last_ms + SESSION_GAP_MS)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed_counts),
                "n_events": closed_counts,
                "closed_by": ["gap"] * len(closed_counts),
            }
        ).astype({"user_id": "int64", "n_events": "int64", "closed_by": "object"})

    return events.groupBy("user_id").applyInPandasWithState(
        _update_session,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


TTL_SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),
    ]
)

TTL_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
    ]
)


def ttl_sessionize(events: DataFrame) -> DataFrame:
    """Gap-sessionization as a CUSTOM stateful operator with state TTL:
    sessions split on 30-min gaps (in-batch and across batches), and
    each user's open session closes by EVENT-TIME TIMEOUT once the
    watermark passes its last event + gap — state is flushed and
    REMOVED, so the store holds only open sessions, never history.

    The differential contract (stream_session_ttl): every session
    except a user's last is gap-closed; the last closes by timeout iff
    final_watermark is STRICTLY past last_event + gap (Spark's
    EventTimeTimeout fires when the watermark advances beyond the set
    timestamp — equality leaves the session open; round-11 review) —
    both mirrored exactly in batch SQL, making a custom
    applyInPandasWithState operator fully value-oracled (not just
    smoke-tested).
    """
    def _update_ttl_sessions(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Full sessionization in arbitrary state: split on in-batch gaps,
        carry the open session across batches, close it on event-time
        timeout."""
        (user_id,) = key
        if state.hasTimedOut:
            n, start_ms, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_ms": [start_ms],
                    "n_events": [n],
                    "closed_by": ["timeout"],
                }
            )
            return
        ts_ms: list[int] = []
        for pdf in pdf_iter:
            if len(pdf):
                ts_ms.extend(int(v.value // 1_000_000) for v in pdf["ts"])
        ts_ms.sort()
        open_sess = list(state.get) if state.exists else None  # [n, start, last]
        closed: list[tuple[int, int, str]] = []
        for t_ in ts_ms:
            if open_sess is None:
                open_sess = [1, t_, t_]
            elif t_ - open_sess[2] > SESSION_GAP_MS:
                closed.append((open_sess[1], open_sess[0], "gap"))
                open_sess = [1, t_, t_]
            else:
                open_sess[0] += 1
                open_sess[2] = max(open_sess[2], t_)
        if open_sess is not None:
            state.update(tuple(open_sess))
            state.setTimeoutTimestamp(open_sess[2] + SESSION_GAP_MS)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start_ms": [c[0] for c in closed],
                "n_events": [c[1] for c in closed],
                "closed_by": [c[2] for c in closed],
            }
        ).astype(
            {
                "user_id": "int64",
                "session_start_ms": "int64",
                "n_events": "int64",
                "closed_by": "object",
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update_ttl_sessions,
        outputStructType=TTL_SESSION_OUTPUT_SCHEMA,
        stateStructType=TTL_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


#: Last-touch attribution (streaming twin of the batch
#: event_attribution_last_touch query): state = the user's latest
#: marketing touch, purchases attribute against it as they stream in.
ATTRIBUTION_LOOKBACK_US = 7 * 24 * 3600 * 1_000_000

ATTR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("purchase_id", T.LongType()),
        T.StructField("purchase_ts_us", T.LongType()),
        T.StructField("touch_event_id", T.LongType()),
        T.StructField("touch_type", T.StringType()),
        T.StructField("gap_seconds", T.LongType()),
    ]
)

#: (latest touch) — µs event time, event id, type.
ATTR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("tts_us", T.LongType()),
        T.StructField("tid", T.LongType()),
        T.StructField("ttype", T.StringType()),
    ]
)


def attribute_last_touch(events: DataFrame) -> DataFrame:
    """Streaming last-touch attribution: one (latest-touch) struct per
    user in the state store; purchases emit their attribution the
    micro-batch they arrive — the real-time version of the batch
    running-struct window (event_attribution_last_touch), and the
    operator a marketing pipeline actually deploys (attribution at
    conversion time, not in a nightly batch).

    State is O(active users) × one struct; production adds an
    event-time TTL at the lookback horizon to garbage-collect quiet
    users (the ttl_sessionize pattern) — elided here so the bounded
    drain keeps every key inspectable.
    """
    def _update_last_touch(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Replay this batch's rows for one user in (ts, event_id) order:
        touches advance the latest-touch state, purchases attribute against
        it (7-day lookback, lexicographic "before" — identical tie
        semantics to the batch window form)."""
        (user_id,) = key
        rows: list[tuple[int, int, str]] = []
        for pdf in pdf_iter:
            for ts, eid, etype in zip(pdf["ts"], pdf["event_id"], pdf["event_type"]):
                rows.append((int(ts.value // 1_000), int(eid), str(etype)))
        rows.sort()
        touch = tuple(state.get) if state.exists else None  # (tts_us, tid, ttype)
        out: list[tuple[int, int, int, str, int]] = []
        for tus, eid, etype in rows:
            if etype in ("click", "view"):
                if touch is None or (tus, eid) > (touch[0], touch[1]):
                    touch = (tus, eid, etype)
            elif etype == "purchase" and touch is not None:
                # touch-before-purchase ordering check (round-11
                # streaming review): under multi-batch arrival a touch
                # with a LATER event time can reach the state store in
                # an earlier micro-batch; without the lexicographic
                # guard this purchase would be attributed to a touch
                # that happened AFTER it. With the guard the purchase
                # goes unattributed instead — identical to the batch
                # form whenever per-user arrival is event-time-ordered
                # (the watermarked production contract); an
                # out-of-order LATER touch can still mask an earlier
                # one in the single-struct state, which is the
                # documented state-size/exactness trade.
                if (touch[0], touch[1]) < (tus, eid) and touch[
                    0
                ] >= tus - ATTRIBUTION_LOOKBACK_US:
                    out.append(
                        (eid, tus, touch[1], touch[2], (tus - touch[0]) // 1_000_000)
                    )
        if touch is not None:
            state.update(touch)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out),
                "purchase_id": [o[0] for o in out],
                "purchase_ts_us": [o[1] for o in out],
                "touch_event_id": [o[2] for o in out],
                "touch_type": [o[3] for o in out],
                "gap_seconds": [o[4] for o in out],
            }
        ).astype(
            {
                "user_id": "int64",
                "purchase_id": "int64",
                "purchase_ts_us": "int64",
                "touch_event_id": "int64",
                "touch_type": "object",
                "gap_seconds": "int64",
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update_last_touch,
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
