"""Content-defined chunking (gear-hash CDC, FastCDC-family) — the
dedup-friendly alternative to fixed-size chunking for training-data
and storage pipelines. Boundaries are chosen where a rolling hash of
the recent byte window hits a mask condition, so an insertion near
the front of a document only perturbs chunks up to the next boundary
— the rest of the chunk stream (and therefore its dedup hashes) is
unchanged. Fixed-size chunking shifts EVERY downstream chunk.

The rolling hash is the "gear" construction (Xia et al., FastCDC,
USENIX ATC'16): ``h = (h << 1 + GEAR[byte]) mod 2^64`` — one shift
and one table lookup per byte, with the window implicit (old bytes
age out of the top bits). A boundary is declared at the first
position where ``h & mask == 0`` after `min_size` bytes; `max_size`
force-cuts pathological (mask-free) runs so a chunk is always in
``[min_size, max_size]`` except a short final tail.

Spark shape: the per-document byte scan is inherently sequential, so
it runs as an Arrow-batched ``mapInPandas`` (one pass per document,
no shuffle — chunking is embarrassingly parallel across documents).
The pure-Python kernel (`cdc_boundaries`) is exposed separately so
properties (reconstruction, bounds, edit-locality) are testable
without a SparkSession.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MASK64 = (1 << 64) - 1


def _gear_table() -> list[int]:
    """256 deterministic 64-bit gear values via splitmix64 (public
    constant-seeded PRNG — reproducible across runs and machines)."""
    out = []
    state = 0x9E3779B97F4A7C15
    for _ in range(256):
        state = (state + 0x9E3779B97F4A7C15) & _MASK64
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK64
        out.append(z ^ (z >> 31))
    return out


GEAR = _gear_table()


def cdc_boundaries(
    data: bytes,
    min_size: int = 64,
    avg_bits: int = 8,
    max_size: int = 1024,
) -> list[int]:
    """Chunk END offsets (exclusive) for `data`. Average chunk size
    ~= 2^avg_bits bytes between min_size and max_size."""
    if min_size < 1 or max_size < min_size:
        raise ValueError("need 1 <= min_size <= max_size")
    mask = (1 << avg_bits) - 1
    cuts: list[int] = []
    h = 0
    start = 0
    for i, b in enumerate(data):
        h = ((h << 1) + GEAR[b]) & _MASK64
        size = i - start + 1
        if (size >= min_size and (h & mask) == 0) or size >= max_size:
            cuts.append(i + 1)
            start = i + 1
            h = 0
    if start < len(data):
        cuts.append(len(data))
    return cuts


def chunk_bytes(
    data: bytes,
    min_size: int = 64,
    avg_bits: int = 8,
    max_size: int = 1024,
) -> list[tuple[int, int, int]]:
    """(start, length, crc32) per chunk, in order."""
    cuts = cdc_boundaries(data, min_size, avg_bits, max_size)
    out = []
    start = 0
    for end in cuts:
        out.append((start, end - start, zlib.crc32(data[start:end])))
        start = end
    return out


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_size: int = 64,
    avg_bits: int = 8,
    max_size: int = 1024,
) -> DataFrame:
    """Explode documents into content-defined chunks:
    (id, chunk_idx, chunk_start, chunk_len, chunk_crc). Text is
    chunked as UTF-8 bytes; empty/NULL documents produce no rows."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, lens, crcs = [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                data = text.encode("utf-8")
                for ci, (start, length, crc) in enumerate(
                    chunk_bytes(data, min_size, avg_bits, max_size)
                ):
                    ids.append(doc_id)
                    idxs.append(ci)
                    starts.append(start)
                    lens.append(length)
                    crcs.append(crc)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "chunk_start": pd.Series(starts, dtype="int64"),
                    "chunk_len": pd.Series(lens, dtype="int64"),
                    "chunk_crc": pd.Series(crcs, dtype="int64"),
                }
            )

    schema = (
        f"{id_col} bigint, chunk_idx int, chunk_start bigint, "
        "chunk_len bigint, chunk_crc bigint"
    )
    return df.select(id_col, text_col).mapInPandas(scan, schema)
