"""Structured Streaming surface: streaming ingest of document/event
streams and watermarked windowed aggregation (SURVEY.md §2.6).

The reference's "streaming" is an interactive one-file-at-a-time
upload loop (`streamlit_app.py:127`); the Spark-native equivalent is
``readStream`` over a landing directory + the same lazy transformation
chain + an idempotent sink.
"""
