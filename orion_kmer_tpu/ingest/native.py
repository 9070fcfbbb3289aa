"""ctypes binding for the native C++ FASTA/FASTQ tokenizer.

Compiles native/fastx.cpp on first use (g++ -O3, cached by source hash)
and exposes ``parse_fastx_packed``: one C pass over a decompressed
buffer producing the full 2-bit code stream with inter-record
separators, per-record offsets, and ids -- the zero-Python-per-record
ingest path (SURVEY.md section 7, layer 1).

Falls back cleanly: callers check ``available()`` and use the pure
Python parser otherwise.  Disable with ORION_KMER_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

from ..errors import ContextError

logger = logging.getLogger("orion_kmer_tpu.ingest.native")

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "fastx.cpp"
_BUILD_DIR = Path(
    os.environ.get("ORION_KMER_BUILD_DIR", _REPO_ROOT / "native" / "_build")
)

_lock = threading.Lock()
_lib = None
_lib_failed = False

OKT_OK = 0
OKT_EMPTY = -1
OKT_UNKNOWN_FORMAT = -2
OKT_MALFORMED = -3
OKT_CAPACITY = -4
OKT_BADCOUNT = -5

_ERROR_NAMES = {
    OKT_EMPTY: "empty input",
    OKT_UNKNOWN_FORMAT: "unknown format (expected '>' or '@')",
    OKT_MALFORMED: "malformed record",
    OKT_CAPACITY: "output capacity exceeded",
    OKT_BADCOUNT: "non-positive count (corrupted table)",
}


def _compile() -> Path:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = _BUILD_DIR / f"libokt_fastx_{tag}.so"
    if so_path.exists():
        return so_path
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    tmp = so_path.with_suffix(".so.tmp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", str(tmp), str(_SRC)]
    logger.info("Compiling native ingest: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so_path)
    return so_path


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if os.environ.get("ORION_KMER_NATIVE", "1") == "0" or not _SRC.exists():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_compile()))
            lib.okt_parse_fastx.restype = ctypes.c_long
            lib.okt_parse_fastx.argtypes = [
                ctypes.c_char_p,  # data
                ctypes.c_long,  # len
                ctypes.c_int,  # normalize
                ctypes.c_long,  # sep
                ctypes.c_int,  # eof
                ctypes.c_void_p,  # codes
                ctypes.c_long,  # codes_cap
                ctypes.c_void_p,  # rec_code_end
                ctypes.c_void_p,  # id_blob
                ctypes.c_long,  # id_cap
                ctypes.c_void_p,  # id_end
                ctypes.c_long,  # max_records
                ctypes.c_void_p,  # out
            ]
            lib.okt_pack_wire.restype = ctypes.c_long
            lib.okt_pack_wire.argtypes = [
                ctypes.c_void_p,  # codes
                ctypes.c_long,  # n
                ctypes.c_long,  # size
                ctypes.c_void_p,  # lanes
                ctypes.c_void_p,  # invalid_words
            ]
            lib.okt_merge_unique.restype = ctypes.c_long
            lib.okt_merge_unique.argtypes = [
                ctypes.c_void_p,  # v1
                ctypes.c_void_p,  # c1
                ctypes.c_long,  # n1
                ctypes.c_void_p,  # v2
                ctypes.c_void_p,  # c2
                ctypes.c_long,  # n2
                ctypes.c_void_p,  # out_v
                ctypes.c_void_p,  # out_c
            ]
            lib.okt_merge_unique_kway.restype = ctypes.c_long
            lib.okt_merge_unique_kway.argtypes = [
                ctypes.c_void_p,  # vs (uint64_t**)
                ctypes.c_void_p,  # cs (int64_t**)
                ctypes.c_void_p,  # ns (long*)
                ctypes.c_long,  # r
                ctypes.c_void_p,  # out_v
                ctypes.c_void_p,  # out_c
            ]
            lib.okt_write_counts_tsv.restype = ctypes.c_long
            lib.okt_write_counts_tsv.argtypes = [
                ctypes.c_void_p,  # vals
                ctypes.c_void_p,  # counts
                ctypes.c_long,  # n
                ctypes.c_int,  # k
                ctypes.c_void_p,  # out
                ctypes.c_long,  # cap
            ]
            lib.okt_pack_wire_multi.restype = ctypes.c_long
            lib.okt_pack_wire_multi.argtypes = [
                ctypes.c_void_p,  # codes
                ctypes.c_void_p,  # invalid
                ctypes.c_long,  # n_rows
                ctypes.c_long,  # stride
                ctypes.c_long,  # size
                ctypes.c_void_p,  # lanes
                ctypes.c_void_p,  # invalid_words
            ]
            _lib = lib
        except (OSError, subprocess.CalledProcessError) as e:
            logger.warning("Native ingest unavailable (%s); using Python parser", e)
            _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


class NativeParseError(ContextError):
    def __init__(self, code: int, source: str):
        self.code = code
        super().__init__(
            f"Failed to parse FASTA/Q content from: {source}: "
            f"{_ERROR_NAMES.get(code, f'error {code}')}"
        )


def parse_fastx_chunk(
    data: bytes,
    k: int,
    normalize: bool = True,
    eof: bool = True,
    source: str = "<bytes>",
):
    """Incremental parse + pack of one stream chunk in one native pass.

    With eof=False the trailing incomplete record is rolled back and the
    returned ``consumed`` byte count tells the caller what prefix was
    parsed (carry ``data[consumed:]`` into the next chunk) -- the
    streaming contract of the reference's BufRead per-record loop
    (utils.rs:125-152, count.rs:63-79), keeping memory O(chunk).

    Returns (codes uint8[N], rec_code_end int64[R], ids list[bytes],
    consumed int): codes holds the complete records' 2-bit codes
    separated by k-1 invalid bytes; rec_code_end[i] is the end offset of
    record i's bases in codes.
    """
    lib = _load()
    assert lib is not None, "native ingest not available"
    n = len(data)
    if n == 0:
        if eof:
            raise NativeParseError(OKT_EMPTY, source)
        return np.empty(0, np.uint8), np.empty(0, np.int64), [], 0
    # upper bounds: every byte could be sequence; every 2 bytes a record
    max_records = max(data.count(b"\n>") + data.count(b"\n@") + 2, 4)
    sep = k - 1
    codes_cap = n + sep * max_records + sep
    codes = np.empty(codes_cap, dtype=np.uint8)
    rec_end = np.empty(max_records, dtype=np.int64)
    id_blob = np.empty(n + 1, dtype=np.uint8)
    id_end = np.empty(max_records, dtype=np.int64)
    out = np.zeros(4, dtype=np.int64)
    rc = lib.okt_parse_fastx(
        data,
        n,
        1 if normalize else 0,
        sep,
        1 if eof else 0,
        codes.ctypes.data_as(ctypes.c_void_p),
        codes_cap,
        rec_end.ctypes.data_as(ctypes.c_void_p),
        id_blob.ctypes.data_as(ctypes.c_void_p),
        n + 1,
        id_end.ctypes.data_as(ctypes.c_void_p),
        max_records,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != OKT_OK:
        raise NativeParseError(int(rc), source)
    n_records, codes_len, id_len = int(out[0]), int(out[1]), int(out[2])
    ids_bytes = id_blob[:id_len].tobytes()
    ends = id_end[:n_records]
    starts = np.concatenate([[0], ends[:-1]])
    ids = [ids_bytes[s:e] for s, e in zip(starts.tolist(), ends.tolist())]
    return codes[:codes_len], rec_end[:n_records].copy(), ids, int(out[3])


def parse_fastx_packed(
    data: bytes, k: int, normalize: bool = True, source: str = "<bytes>"
):
    """Whole-buffer parse + pack (eof semantics; see parse_fastx_chunk)."""
    codes, rec_end, ids, _consumed = parse_fastx_chunk(
        data, k, normalize=normalize, eof=True, source=source
    )
    return codes, rec_end, ids


def merge_unique(v1, c1, v2, c2):
    """Native merge of two sorted-unique (vals u64, counts i64) runs,
    summing counts of shared values.  ~100x the numpy searchsorted
    interleave on the 1-core host (see engine._merge_sorted_unique_runs,
    which calls this when available)."""
    lib = _load()
    assert lib is not None, "native ingest not available"
    v1 = np.ascontiguousarray(v1, dtype=np.uint64)
    v2 = np.ascontiguousarray(v2, dtype=np.uint64)
    c1 = np.ascontiguousarray(c1, dtype=np.int64)
    c2 = np.ascontiguousarray(c2, dtype=np.int64)
    n1, n2 = v1.shape[0], v2.shape[0]
    out_v = np.empty(n1 + n2, dtype=np.uint64)
    out_c = np.empty(n1 + n2, dtype=np.int64)
    _advise_hugepages(out_v)
    _advise_hugepages(out_c)
    n = lib.okt_merge_unique(
        v1.ctypes.data_as(ctypes.c_void_p),
        c1.ctypes.data_as(ctypes.c_void_p),
        n1,
        v2.ctypes.data_as(ctypes.c_void_p),
        c2.ctypes.data_as(ctypes.c_void_p),
        n2,
        out_v.ctypes.data_as(ctypes.c_void_p),
        out_c.ctypes.data_as(ctypes.c_void_p),
    )
    if n == n1 + n2:
        return out_v, out_c
    return _trim(out_v, n), _trim(out_c, n)


def _trim(arr: np.ndarray, n: int) -> np.ndarray:
    """Exact-size copy of a merge output's valid prefix, with the copy
    target hugepage-advised too (a plain arr[:n].copy() first-touches a
    second full-size buffer through 4 KB faults, clawing back much of
    the single-allocation win)."""
    out = np.empty(n, dtype=arr.dtype)
    _advise_hugepages(out)
    np.copyto(out, arr[:n])
    return out


# Past this, the O(N*r) linear head scan of the k-way merge loses to a
# pairwise reduction; the accumulator's consolidation keeps r far below
# it in practice.
MAX_KWAY = 32

_MADV_HUGEPAGE = 14
_libc = None


def _advise_hugepages(arr: np.ndarray) -> None:
    """madvise(MADV_HUGEPAGE) a fresh numpy buffer before first touch.

    First-touch page faults dominate large merge outputs on this host
    (measured ~4.4 s to fault 640 MB vs ~0.3 s to write it); with THP in
    madvise mode (the kernel default here) 2 MB pages cut the fault count
    512x (~2-3x measured wall win).  Best-effort: silently a no-op when
    libc/THP are unavailable."""
    global _libc
    try:
        if _libc is None:
            _libc = ctypes.CDLL("libc.so.6", use_errno=True)
        page = 4096
        addr = arr.ctypes.data
        aligned = (addr + page - 1) // page * page
        length = arr.nbytes - (aligned - addr)
        if length > 1 << 22:
            _libc.madvise(
                ctypes.c_void_p(aligned),
                ctypes.c_size_t(length),
                ctypes.c_int(_MADV_HUGEPAGE),
            )
    except OSError:  # pragma: no cover - platform without libc semantics
        pass


def merge_unique_kway(vals: list, counts: list):
    """Native k-way merge of r sorted-unique (vals u64, counts i64)
    runs in one pass -- one output allocation total (first-touch page
    faults on fresh buffers cost ~10x the merge scan on this VM, so a
    pairwise reduction pays them once per level)."""
    lib = _load()
    assert lib is not None, "native ingest not available"
    r = len(vals)
    assert 1 <= r <= MAX_KWAY
    vs = [np.ascontiguousarray(v, dtype=np.uint64) for v in vals]
    cs = [np.ascontiguousarray(c, dtype=np.int64) for c in counts]
    ns = np.array([v.shape[0] for v in vs], dtype=np.int64)
    total = int(ns.sum())
    vptrs = np.array([v.ctypes.data for v in vs], dtype=np.uintp)
    cptrs = np.array([c.ctypes.data for c in cs], dtype=np.uintp)
    out_v = np.empty(total, dtype=np.uint64)
    out_c = np.empty(total, dtype=np.int64)
    _advise_hugepages(out_v)
    _advise_hugepages(out_c)
    n = lib.okt_merge_unique_kway(
        vptrs.ctypes.data_as(ctypes.c_void_p),
        cptrs.ctypes.data_as(ctypes.c_void_p),
        ns.ctypes.data_as(ctypes.c_void_p),
        r,
        out_v.ctypes.data_as(ctypes.c_void_p),
        out_c.ctypes.data_as(ctypes.c_void_p),
    )
    if n == total:
        return out_v, out_c
    return _trim(out_v, n), _trim(out_c, n)


def counts_tsv_bytes(
    vals: np.ndarray, counts: np.ndarray, k: int, out: np.ndarray | None = None
) -> memoryview:
    """Render `KMER\\tCOUNT\\n` lines natively; byte-identical to the
    Python codec.u64s_to_seqs path (measured 0.83M -> ~7M lines/s on
    this 1-core host, ~8.4x).  Counts <= 0 raise (OKT_BADCOUNT):
    pipeline counts are >= 1, so a non-positive value is corruption.

    Pass ``out`` (uint8, >= n*(k+22) bytes) to reuse one buffer across
    chunks -- a fresh ~90 MB allocation per chunk re-pays first-touch
    page faults that cost multiples of the render itself here."""
    lib = _load()
    assert lib is not None, "native ingest not available"
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    n = vals.shape[0]
    if out is None:
        out = np.empty(n * (k + 22), dtype=np.uint8)
        _advise_hugepages(out)
    else:
        assert out.dtype == np.uint8 and out.shape[0] >= n * (k + 22)
    m = lib.okt_write_counts_tsv(
        vals.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.c_void_p),
        n,
        k,
        out.ctypes.data_as(ctypes.c_void_p),
        out.shape[0],
    )
    if m < 0:
        raise NativeParseError(int(m), "<counts_tsv>")
    return memoryview(out.data)[: int(m)]


def pack_wire(codes: np.ndarray, size: int):
    """Native wire-format packing: codes u8[n] (255 = invalid), padded to
    ``size`` -> (lanes u32[size/16], invalid u32[size/32]).  Same output
    as engine.pack_for_transfer's numpy path, ~5x faster single-core."""
    lib = _load()
    assert lib is not None, "native ingest not available"
    assert size % 32 == 0
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    n = codes.shape[0]
    lanes = np.empty(size // 16, dtype=np.uint32)
    inv = np.empty(size // 32, dtype=np.uint32)
    rc = lib.okt_pack_wire(
        codes.ctypes.data_as(ctypes.c_void_p),
        n,
        size,
        lanes.ctypes.data_as(ctypes.c_void_p),
        inv.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != OKT_OK:
        raise NativeParseError(int(rc), "<pack_wire>")
    return lanes, inv
