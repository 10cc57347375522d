"""LLM-data-pipeline operators (BASELINE.json north star): dedup,
similarity search, text analysis, multimodal-column plumbing.

All operators are DataFrame -> DataFrame, built from JVM-side
expressions wherever semantics allow; Pandas UDFs appear only where
genuinely required (multimodal decode). Each is designed for the
100 TB posture: no driver-side collection, broadcast for small sides,
LSH instead of cross joins on the scale path.
"""
