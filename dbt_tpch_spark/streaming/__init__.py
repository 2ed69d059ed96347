"""Event-time windowing over the ``events`` table.

The reference's only streaming-adjacent artifact is the unused ``event_time``
source config (models/_source/source_tpch.yml:11-12,15-16; SURVEY §2.10), so
this surface is a from-scratch extension. Each window shape is implemented
twice:

* a **batch-equivalent** model (``streaming/windows.py``) over the parquet
  ``events`` table — oracle-checkable in DuckDB (tumbling == time_bucket);
* a **Structured Streaming** builder (:func:`streaming_query`) using
  ``readStream`` + ``withWatermark`` — exercised in tests with an
  ``availableNow`` trigger into a memory sink and asserted equal to the
  batch result.
"""
