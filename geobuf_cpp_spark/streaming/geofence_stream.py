"""Custom stateful streaming: geofence enter/exit transitions via
``applyInPandasWithState``.

The transition test ("did this ping's region differ from the PREVIOUS
ping's?") depends on the last event seen, not on any window grid — the
same class of operator as sessionization, inexpressible with watermarked
windows. State per user: (last_e, last_seq, last_region) — three longs,
O(active users) regardless of stream length.

Region resolution happens inside the state kernel against the BROADCAST
box dimension (a plain Python list in the closure — the fence set is a
dimension table by definition; at production scale it rides the same
task-broadcast the batch twin's ``F.broadcast`` join uses). Overlaps
resolve to min(admin_id), outside-all-fences is region -1, and the
first ping a user ever sends transitions from the -2 "nowhere" sentinel
— bit-identical semantics to the batch twin
(``operators/trajectory.geofence_events``), asserted by the
stream==batch pytest, not assumed.

Ordering contract: within a micro-batch, pings sort by (epoch, seq)
before the scan; ACROSS batches the state only carries the latest ping,
so exact stream == batch equivalence requires per-user in-order arrival
at batch granularity (the normal log-ingest cadence — same concession
as ``streaming/sessions.py``, where it is documented at length). For
shuffled history, run the batch twin.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRANSITION_SCHEMA = (
    "user_id long, seq long, e long, region long, prev_region long"
)
STATE_SCHEMA = "last_e long, last_seq long, last_region long"


def _region_of(x: int, y: int, boxes: list) -> int:
    """min(admin_id) containing (x, y), else -1 — the batch twin's
    coalesce(min(admin_id), -1) in plain Python."""
    best = -1
    for admin_id, lon0, lat0, lon1, lat1 in boxes:
        if lon0 <= x < lon1 and lat0 <= y < lat1:
            if best == -1 or admin_id < best:
                best = admin_id
    return best


def geofence_transitions_stream(pings: DataFrame, boxes: list) -> DataFrame:
    """Streaming twin of ``geofence_events``.

    ``pings``: streaming frame with (user_id, event_id, ts, ix, iy).
    ``boxes``: list of (admin_id, lon0, lat0, lon1, lat1) tuples — the
    fence dimension, captured by the kernel closure.
    """
    fence = [tuple(int(v) for v in b) for b in boxes]

    def update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_e, last_seq, last_region = state.get
        else:
            last_e, last_seq, last_region = -1, -1, -2
        out = []
        for pdf in batches:
            pdf = pdf.sort_values(["e", "seq"])
            for seq, e, x, y in zip(pdf["seq"], pdf["e"],
                                    pdf["x"], pdf["y"]):
                region = _region_of(int(x), int(y), fence)
                if region != last_region:
                    out.append((user_id, int(seq), int(e), region,
                                last_region))
                last_e, last_seq, last_region = int(e), int(seq), region
        state.update((last_e, last_seq, last_region))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "seq", "e", "region", "prev_region"],
            )

    prepared = pings.select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.floor(F.unix_timestamp("ts").cast("double")).cast("long")
        .alias("e"),
        F.col("ix").cast("long").alias("x"),
        F.col("iy").cast("long").alias("y"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
