"""Deterministic synthetic token-sequence table (the north-rule input shape).

Schema, exactly the driver input_hint:
    doc_id:string  tokens:list<int32>  n_tok:int32  source:string

Token streams are trend + seasonal(period=60) + noise quantized to the
vocab [0, 50257) (FIXTURES.md F1). Generation is chunk-independent: every
value is a pure function of (doc index, position) via splitmix64, so any
chunking / parallelism produces identical bytes.

Writes a parquet directory of fixed-size part files with a manifest, cached
under /tmp so repeated test/bench runs skip regeneration.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .timebase import SOURCES, source_index_for_doc, splitmix64, unit_uniform

VOCAB = 50257
SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

_LEN_SALT = np.uint64(0x5151515151515151)
_TOK_SALT = np.uint64(0x1357246813572468)


def doc_lengths(i: np.ndarray, max_len: int = 512) -> np.ndarray:
    """Long-tailed lengths in [16, max_len] (cube-law tail)."""
    u = unit_uniform(np.asarray(i, dtype=np.uint64) ^ _LEN_SALT)
    return (16 + np.floor(u**3 * (max_len - 15))).astype(np.int32)


def token_chunk(start: int, end: int, max_len: int = 512) -> pa.Table:
    """Generate docs [start, end) as an Arrow table."""
    i = np.arange(start, end, dtype=np.int64)
    n_tok = doc_lengths(i, max_len)
    src_idx = source_index_for_doc(i)
    total = int(n_tok.sum())
    # flat position / doc-seed arrays for the whole chunk
    reps = n_tok.astype(np.int64)
    doc_of = np.repeat(np.arange(len(i)), reps)
    offsets0 = np.concatenate([[0], np.cumsum(reps)])
    j = np.arange(total, dtype=np.int64) - offsets0[:-1][doc_of]
    seed = (i[doc_of].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ _TOK_SALT
    with np.errstate(over="ignore"):
        noise = (splitmix64(seed + j.astype(np.uint64)) % np.uint64(41)).astype(np.int64) - 20
    wave = np.rint(40.0 * np.sin(2.0 * np.pi * (j % 60) / 60.0)).astype(np.int64)
    trend = (j // 16) * ((i[doc_of] % 3) - 1)
    tok = (1000 + wave + trend + noise) % VOCAB
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets0, type=pa.int32()), pa.array(tok.astype(np.int32))
    )
    doc_ids = pa.array([f"doc-{k:08d}" for k in i.tolist()], type=pa.string())
    sources = pa.DictionaryArray.from_arrays(
        pa.array(src_idx.astype(np.int32)), pa.array(list(SOURCES))
    ).cast(pa.string())
    return pa.table(
        {
            "doc_id": doc_ids,
            "tokens": tokens,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": sources,
        },
        schema=SCHEMA,
    )


def synth_path(n_docs: int, max_len: int = 512, root: str = "/tmp/feasts_ray_synth") -> Path:
    return Path(root) / f"docs_n{n_docs}_L{max_len}"


def _write_part(args: tuple) -> None:
    f, docs_per_file, n_docs, max_len, tmp = args
    lo, hi = f * docs_per_file, min((f + 1) * docs_per_file, n_docs)
    # small row groups so Ray's parquet reader can parallelize within
    # a file (single-row-group files cap read parallelism at #files)
    pq.write_table(token_chunk(lo, hi, max_len),
                   Path(tmp) / f"part-{f:05d}.parquet", row_group_size=8192)


def ensure_token_table(
    n_docs: int,
    max_len: int = 512,
    docs_per_file: int = 50_000,
    root: str = "/tmp/feasts_ray_synth",
    workers: int | None = None,
) -> str:
    """Write (or reuse) the deterministic token table; returns the directory.

    Every value is a pure function of (doc index, position), so part files
    are independent and generation fans out over a process pool — bytes are
    identical at any worker count (default: half the cores for tables big
    enough to care, serial below 1M docs).
    """
    out = synth_path(n_docs, max_len, root)
    manifest = out / "_MANIFEST.json"
    if manifest.exists():
        try:
            meta = json.loads(manifest.read_text())
            if meta.get("n_docs") == n_docs and meta.get("max_len") == max_len:
                return str(out)
        except (json.JSONDecodeError, OSError):
            pass
    tmp = Path(str(out) + ".tmp")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    tmp.mkdir(parents=True, exist_ok=True)
    nfiles = max(1, (n_docs + docs_per_file - 1) // docs_per_file)
    if workers is None:
        workers = 1 if n_docs < 1_000_000 else max(1, (os.cpu_count() or 2) // 2)
    jobs = [(f, docs_per_file, n_docs, max_len, str(tmp)) for f in range(nfiles)]
    if workers <= 1:
        for job in jobs:
            _write_part(job)
    else:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=workers) as pool:
            # list() drains the iterator so worker exceptions propagate
            list(pool.map(_write_part, jobs, chunksize=4))
    (tmp / "_MANIFEST.json").write_text(
        json.dumps({"n_docs": n_docs, "max_len": max_len, "files": nfiles})
    )
    if out.exists():
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    return str(out)
