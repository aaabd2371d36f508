"""brink_spark — a PySpark-native distributed URL-frontier + fetch scheduler.

A from-scratch reimplementation of the crawl semantics of djavorszky/brink
(reference at /root/reference, Go) as a wave-iterative Spark DataFrame job:

- URL kernel (normalize / scheme+host / path / forbidden-path) with exact
  Go-parity semantics, exposed both as pure-Python kernels (shared with the
  single-threaded oracle) and as vectorized Arrow/pandas UDFs.
- Span-array document model (kind, text, media_ref, offset) for interleaved
  text + media pages (input_hint shape).
- Partitioned Bloom-filter URL-seen set (xxhash64, shard-aligned cogroup
  probe) as a prefilter over the exact anti-join against the visited table.
- Per-host politeness budget (two-phase salted top-k), robots.txt
  allow/deny, priority frontier queue.
- Checkpoint-resumable wave loop over a snapshot-committed parquet table
  store (Iceberg-shaped API; parquet backend in the sandbox).

Reference parity citations use the form ``file:line`` into /root/reference.
"""

__version__ = "0.1.0"
