"""Custom stateful streaming operator: running per-subject edge counts.

Demonstrates ``applyInPandasWithState`` — the Spark surface for
operators whose state must survive across micro-batches (the engine's
equivalent of a stateful stream processor). State: one long per
subject; output: the subject's cumulative edge count after each batch.

Works identically under ``availableNow`` (batch catch-up) and
continuous micro-batch triggers; state is checkpointed with the query.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("node1", T.StringType()),
        T.StructField("total_edges", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("count", T.LongType())])


def _update_counts(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    prev = state.get[0] if state.exists else 0
    batch = sum(len(pdf) for pdf in pdfs)
    total = prev + batch
    state.update((total,))
    yield pd.DataFrame({"node1": [key[0]], "total_edges": [total]})


def running_subject_counts(edges_stream: DataFrame) -> DataFrame:
    """Streaming edges → running cumulative count per node1."""
    return edges_stream.groupBy("node1").applyInPandasWithState(
        _update_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
