"""Spark 4 Python UDTF surface (user-defined TABLE functions).

Policy: UDTFs are a ROW-PYTHON path (each row crosses into the Python
worker), so nothing in the registered workload uses one — the hot-path
chunker (workload.train_prep.chunk_documents) is pure codegen and the
registry-wide plan tripwire (tests/test_plans.py) keeps it that way.
This module exists because the reference-parity surface should still
COVER the API: a UDTF is the right integration point when an external
Python library must emit a variable number of rows per input (a real
tokenizer, a parser producing AST nodes, a format-specific splitter)
and no Arrow-batched equivalent exists.

``ChunkTokens`` mirrors chunk_documents' semantics (window 32, stride
24, md5 per chunk) so the differential test can pin the UDTF's output
to the codegen twin row-for-row — the same oracle discipline as every
registered query, applied to the API demo.
"""

from __future__ import annotations

import hashlib

WINDOW = 32
STRIDE = 24


def chunk_rows(doc_id: int, text: str):
    """Shared reference implementation (plain Python): yields
    (doc_id, chunk_id, n_chunk_tokens, chunk_md5) tuples."""
    toks = [t for t in (text or "").strip().split() if t]
    for i, st in enumerate(range(0, len(toks), STRIDE)):
        chunk = toks[st : st + WINDOW]
        yield (
            doc_id,
            i,
            len(chunk),
            hashlib.md5(" ".join(chunk).encode()).hexdigest(),
        )


def register_chunk_udtf(spark) -> str:
    """Register the chunking UDTF as SQL table function
    ``chunk_tokens`` and return its name. Import-gated: raises
    NotImplementedError where the runtime lacks the UDTF API."""
    try:
        from pyspark.sql.functions import udtf
    except ImportError as e:  # pragma: no cover - Spark 4 always has it
        raise NotImplementedError(f"Python UDTFs need Spark 3.5+: {e}") from e

    @udtf(returnType="doc_id: bigint, chunk_id: int, n_chunk_tokens: int, chunk_md5: string")
    class ChunkTokens:
        def eval(self, doc_id: int, text: str):
            yield from chunk_rows(doc_id, text)

    spark.udtf.register("chunk_tokens", ChunkTokens)
    return "chunk_tokens"
