"""boltspark — a PySpark-native per-column lightweight-compression engine.

Built from scratch (not a port) with the capability surface of
bytedance/bolt-parquet-reader (reference at /root/reference, Rust decode-only):
dictionary, RLE, bit-packing, frame-of-reference and FSST codecs with
sampled-statistics auto-selection, encoded/decoded entirely through
vectorized Arrow/pandas UDFs over DataFrame partitions.

Layers:
  boltspark.kernels  — pure numpy/pyarrow codec kernels (Spark-free)
  boltspark.engine   — Spark layer: salted partitioning, mapInPandas
                       encode/decode, checkpoint manifest, predicates
  boltspark.pipeline — training-data ops (dedup, similarity, text stats)
"""

__version__ = "0.1.0"
