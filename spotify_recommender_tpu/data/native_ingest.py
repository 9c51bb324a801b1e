"""ctypes bindings for the native CSV tokenizer (native/csv_parser.cpp).

The hot host-side loop of preprocessing — per-row tokenize + validate — is
string work that JAX cannot help with; the reference runs it under OpenMP
(reference DataManager.cpp:164-253).  This binding loads the C++ library
(built by ``make -C native``) and falls back transparently when absent;
`csv_ingest.parse_csv_rows` is the behavioral oracle it is tested against
(tests/test_native_ingest.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

from spotify_recommender_tpu.core.logging import get_logger

log = get_logger(__name__)

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native", "libsrt_csv.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:  # pragma: no cover
        log.warning("native csv parser failed to load: %s", e)
        _load_failed = True
        return None
    lib.srt_parse_csv.restype = ctypes.c_void_p
    lib.srt_parse_csv.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32]
    lib.srt_free.argtypes = [ctypes.c_void_p]
    lib.srt_error.restype = ctypes.c_char_p
    lib.srt_error.argtypes = [ctypes.c_void_p]
    for name in ("srt_num_input", "srt_num_valid", "srt_num_genres"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p]
    lib.srt_features.restype = ctypes.POINTER(ctypes.c_float)
    lib.srt_features.argtypes = [ctypes.c_void_p]
    lib.srt_genre_ids.restype = ctypes.POINTER(ctypes.c_int32)
    lib.srt_genre_ids.argtypes = [ctypes.c_void_p]
    for field in ("id", "name", "artist", "genre"):
        arena = getattr(lib, f"srt_{field}_arena")
        arena.restype = ctypes.POINTER(ctypes.c_char)
        arena.argtypes = [ctypes.c_void_p]
        offs = getattr(lib, f"srt_{field}_offs")
        offs.restype = ctypes.POINTER(ctypes.c_int64)
        offs.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _strings(lib, handle, field: str, n: int) -> List[str]:
    offs = np.ctypeslib.as_array(
        getattr(lib, f"srt_{field}_offs")(handle), shape=(n + 1,)
    )
    total = int(offs[n])
    arena = ctypes.string_at(getattr(lib, f"srt_{field}_arena")(handle), total)
    return [
        arena[offs[i] : offs[i + 1]].decode("utf-8", errors="replace")
        for i in range(n)
    ]


def _env_threads() -> int:
    """Thread count from the environment (0 = library auto-detect).

    Honors OMP_NUM_THREADS for parity with the reference's OpenMP
    preprocessing (reference README.md:233-237), with SRT_NUM_THREADS
    taking precedence as the framework-specific override."""
    for var in ("SRT_NUM_THREADS", "OMP_NUM_THREADS"):
        val = os.environ.get(var, "").strip()
        if val:
            try:
                return max(0, int(val))
            except ValueError:
                pass
    return 0


def parse_csv_buffer(data: bytes, num_threads: Optional[int] = None):
    """Parse raw CSV bytes via the native library → RawTable.

    num_threads None = use SRT_NUM_THREADS / OMP_NUM_THREADS from the
    environment (reference parity), falling back to auto-detect."""
    from spotify_recommender_tpu.data.csv_ingest import RawTable

    lib = _load()
    if lib is None:
        raise RuntimeError("native csv parser not built (make -C native)")
    if num_threads is None:
        num_threads = _env_threads()
    handle = lib.srt_parse_csv(data, len(data), num_threads)
    try:
        err = lib.srt_error(handle)
        if err:
            raise ValueError(err.decode())
        n = int(lib.srt_num_valid(handle))
        ng = int(lib.srt_num_genres(handle))
        feats = (
            np.ctypeslib.as_array(lib.srt_features(handle), shape=(n, 11)).copy()
            if n
            else np.zeros((0, 11), np.float32)
        )
        gids = (
            np.ctypeslib.as_array(lib.srt_genre_ids(handle), shape=(n,)).copy()
            if n
            else np.zeros(0, np.int32)
        )
        return RawTable(
            track_ids=np.asarray(_strings(lib, handle, "id", n), dtype=object),
            track_names=np.asarray(_strings(lib, handle, "name", n), dtype=object),
            artists=np.asarray(_strings(lib, handle, "artist", n), dtype=object),
            raw_features=feats.astype(np.float32),
            genre_ids=gids.astype(np.int32),
            genre_names=_strings(lib, handle, "genre", ng),
            num_input_rows=int(lib.srt_num_input(handle)),
            num_valid_rows=n,
        )
    finally:
        lib.srt_free(handle)


def parse_csv_rows_native(header_line: str, data_lines: Sequence[str]):
    """Match csv_ingest.parse_csv_rows's signature for the fallback path."""
    buf = header_line.rstrip("\n") + "\n" + "\n".join(data_lines)
    return parse_csv_buffer(buf.encode("utf-8"))
