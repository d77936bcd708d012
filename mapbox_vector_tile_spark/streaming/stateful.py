"""Custom stateful streaming operator: per-key running aggregates via
``applyInPandasWithState`` (Arrow-batched state function — the stateful
counterpart of the stateless foreachBatch encode in ``encode_stream.py``).

The reference has no streaming at all (SURVEY §2.7); this is the engine
shape a token pipeline needs when tables ARRIVE as streams and per-key
totals must survive across micro-batches: state = (n_events, n_tok_total)
per key, updated once per batch, emitted as a running snapshot (output mode
``update``). Batch parity is exact and tested across multiple micro-batches
(``maxFilesPerTrigger=1`` forces state to actually carry over).

At scale: state lives in the state store partitioned by the grouping key —
the same shuffle-by-key layout the batch aggregate uses, with incremental
updates instead of full recomputation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, n_runs long"
STATE_SCHEMA = "n_events long, n_runs long, last_type string"


def _update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events into (n_events, n_runs) state.

    ``n_runs`` counts maximal runs of equal ``event_type`` in ``(ts,
    event_id)`` order — the streaming form of the RLE-ability stat
    ``functions.components.rle_run_count_events`` computes in batch, so
    batch output is the exact parity oracle. ``last_type`` carries the
    run boundary across micro-batches."""
    if state.exists:
        n_events, n_runs, last_type = state.get
    else:
        n_events, n_runs, last_type = 0, 0, None
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="stable")
    for et in rows["event_type"]:
        n_events += 1
        if last_type is None or et != last_type:
            n_runs += 1
        last_type = et
    state.update((int(n_events), int(n_runs), last_type))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [int(n_events)],
            "n_runs": [int(n_runs)],
        }
    )


def running_event_run_counts(events_stream: DataFrame):
    """Streaming per-user (n_events, n_runs) running totals.

    NOTE: exact parity with the batch stat requires event-time ordered
    arrival across batches (file order == time order), which the tests
    arrange; out-of-order arrival would need a watermark + buffered state,
    the standard trade documented here rather than hidden.
    """
    return (
        events_stream.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
