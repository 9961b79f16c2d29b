"""Column-batch helpers shared by filters and sketches: pandas Series ->
bytes -> 128-bit digests, fully vectorized after the encode step."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .hashes import digest128, pack_bytes


def series_to_bytes(s: pd.Series) -> list[bytes]:
    """Column values -> bytes. Strings are UTF-8 encoded; nulls -> b''."""
    out = []
    for v in s:
        if v is None or (isinstance(v, float) and pd.isna(v)):
            out.append(b"")
        elif isinstance(v, bytes):
            out.append(v)
        elif isinstance(v, bytearray):
            out.append(bytes(v))
        elif isinstance(v, str):
            out.append(v.encode("utf-8"))
        else:
            out.append(str(v).encode("utf-8"))
    return out


def digest_series(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(d0, d1) uint64 digest lanes for each value in the Series."""
    buf, lens = pack_bytes(series_to_bytes(s))
    return digest128(buf, lens)
