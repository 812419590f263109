"""Structured-Streaming runtime: sources, windows, watermark, dedup,
rate-controlled producer, smart-stop monitor, Confluent wire format.

The reference's streaming semantics checklist (SURVEY.md §2C) maps here:
unbounded insert-select → writeStream; earliest offsets; tumbling windows
(+ sliding/session as a superset); watermarks made first-class; stateful
dedup; checkpointing via option("checkpointLocation", ...).
"""
