"""Incremental encode over Structured Streaming.

The reference's "streaming" is incremental batched file reads
(README.md:27 — SURVEY.md §2B maps it to our batch iterator); this
module adds the real event-stream front end on top: a streaming
DataFrame is encoded micro-batch by micro-batch through the SAME
engine, appending blocks + manifest entries.

Exactly-once across failures: each epoch encodes under the
deterministic run id ``stream-{epoch:012d}``; a replayed epoch whose
manifest entry already exists is a no-op, and a crash between the
blocks write and the manifest commit leaves orphan blocks that decode
never sees (it joins blocks ⨝ manifest).  Decode needs no streaming
awareness — appended runs are just more block groups.
"""

from __future__ import annotations

from ..engine.encode import DEFAULT_KEY_COLS, encode_table


def encode_stream(
    stream_df,
    out_path: str,
    manifest_path: str,
    checkpoint_path: str,
    key_cols: tuple[str, ...] = DEFAULT_KEY_COLS,
    n_parts: int = 64,
    trigger_seconds: int | None = None,
    **encode_kw,
):
    """writeStream.foreachBatch(encode) -> StreamingQuery.

    ``n_parts`` is fixed up front: partition identity must not depend on
    the (growing) data size, or lineage would drift between epochs.
    """

    def handle(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        encode_table(
            batch_df, out_path, manifest_path,
            key_cols=key_cols, n_parts=n_parts, resume=False,
            run_id=f"stream-{epoch_id:012d}", **encode_kw,
        )

    writer = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
