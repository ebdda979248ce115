"""Document chunking (fixed-size windows with overlap) — the standard
pre-step for embedding/RAG/training pipelines over long documents.

Two implementations of the same semantics:

  * `fixed_chunks` — pure JVM column expression (sequence + transform
    + substring), the scale path: per-row expansion inside codegen,
    no Python.
  * `ChunkDocs` — a Python UDTF (PySpark 4 user-defined TABLE
    function, §2.10 surface): same output via `LATERAL`, demonstrating
    the API for expansions whose logic outgrows column expressions
    (tokenizer-aware splitting, sentence boundaries). pytest asserts
    the two paths agree row-for-row.

Chunk math (0-based): starts at 0, step = size - overlap; a chunk
exists while start < length; the last chunk may be short. Empty
documents produce no chunks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


def fixed_chunks(text: Column | str, size: int = 120, overlap: int = 20) -> Column:
    """array<struct<chunk_id:int, chunk:string>> — fixed windows with
    overlap, entirely JVM-side."""
    if overlap >= size:
        raise ValueError("overlap must be smaller than size")
    step = size - overlap
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    idx = F.sequence(F.lit(0), F.floor((n - 1) / step).cast("int"))
    chunks = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.substring(c, i * step + 1, size).alias("chunk"),
        ),
    )
    return F.when(n > 0, chunks).otherwise(
        F.array().cast("array<struct<chunk_id:int,chunk:string>>")
    )


@udtf(returnType="chunk_id int, chunk string")
class ChunkDocs:
    """UDTF form: SELECT ... FROM docs, LATERAL chunk_docs(text).
    Same chunk math as fixed_chunks (size=120, overlap=20)."""

    SIZE = 120
    OVERLAP = 20

    def eval(self, text: str):
        if not text:
            return
        step = self.SIZE - self.OVERLAP
        for cid, start in enumerate(range(0, len(text), step)):
            yield cid, text[start : start + self.SIZE]
