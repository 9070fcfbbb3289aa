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

_ERROR_NAMES = {
    OKT_EMPTY: "empty input",
    OKT_UNKNOWN_FORMAT: "unknown format (expected '>' or '@')",
    OKT_MALFORMED: "malformed record",
    OKT_CAPACITY: "output capacity exceeded",
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
