"""Structured Streaming replacements for the reference's hand-rolled
mechanisms (SURVEY.md §2.9): adaptive download polling -> file-source
micro-batches; seen-file set-difference -> checkpointed file log;
full-date re-runs for late data -> watermarks + idempotent foreachBatch.
"""
