"""Python UDTF surface (Spark 4): table functions invoked through
LATERAL joins — the row-expanding escape hatch of §2.13's UDF/UDAF/
UDTF inventory. Kept minimal on purpose: UDTFs run row-at-a-time in
Python, so anything expressible as explode/sequence/inline built-ins
(doc_chunk_windows does this chunker's job in pure SQL) should stay
JVM-side; the UDTF exists for generator logic with data-dependent
loop structure, and the driver query pins that the Python loop and
the relational replay agree exactly.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_no int, start int, length int")
class ChunkSpans:
    """Sliding chunk spans over a length: size-char windows advancing
    by (size - overlap), final partial window kept — the RAG-style
    chunk plan as a generator (one output row per chunk), without
    materializing text."""

    def eval(self, n_chars: int, size: int, overlap: int):  # noqa: D102
        if n_chars is None or n_chars <= 0 or size <= overlap:
            return
        step = size - overlap
        k, start = 0, 0
        while start < n_chars:
            yield k, start, min(size, n_chars - start)
            if start + size >= n_chars:
                break
            start += step
            k += 1


def register_udtfs(spark) -> None:
    spark.udtf.register("chunk_spans", ChunkSpans)
