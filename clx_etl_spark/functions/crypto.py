"""Payload decryption UDFs (SURVEY T13).

The reference decrypts an on-chain explorer's obfuscated API responses:
AES-ECB over base64 ciphertext with a per-request key derived from the
request timestamp, PKCS7-unpadded, applied recursively over JSON strings
(reference: src/macro_markets/oklink/decrypt_post.py:40-123). Spark's
builtin ``aes_decrypt`` can't express the key-per-row derivation chain, so
this is one of the two places the engine deliberately enters Python — as
an Arrow-batched pandas UDF, never per-row py4j.

Gated behind a ``cryptography`` import so environments without the lib
still import the engine; the UDF raises only when actually used.
"""

from __future__ import annotations

import base64
import hashlib

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

try:  # optional dependency — plumbing stays importable without it
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    _HAVE_CRYPTO = True
except ImportError:  # pragma: no cover
    _HAVE_CRYPTO = False


def derive_key_from_ts(ts_ms: int) -> bytes:
    """Per-request AES-128 key: first 16 bytes of SHA1 of the millisecond
    timestamp string (the reference's CryptoJS-compatible derivation,
    decrypt_post.py:49-56)."""
    return hashlib.sha1(str(ts_ms).encode()).digest()[:16]


def _aes_ecb_decrypt_one(cipher_b64: str, key: bytes) -> str | None:
    if cipher_b64 is None:
        return None
    data = base64.b64decode(cipher_b64)
    dec = Cipher(algorithms.AES(key), modes.ECB()).decryptor()
    plain = dec.update(data) + dec.finalize()
    if not plain:
        return ""
    pad = plain[-1]
    # strip only a well-formed PKCS7 tail (all `pad` bytes equal `pad`);
    # tolerate unpadded payloads (CryptoJS quirk) — a range check on the
    # last byte alone would silently truncate genuine data
    if 1 <= pad <= 16 and plain[-pad:] == bytes([pad]) * pad:
        plain = plain[:-pad]
    return plain.decode("utf-8", errors="replace")


# DataType instance (not DDL string): a string returnType would be parsed
# at import time, which requires an active SparkSession
@pandas_udf(StringType())
def aes_ecb_decrypt_with_ts(cipher_b64: pd.Series, ts_ms: pd.Series) -> pd.Series:
    """Vectorized decrypt: per-row key derived from the row's timestamp.
    Columns: (ciphertext base64, epoch-ms long)."""
    if not _HAVE_CRYPTO:  # pragma: no cover
        raise NotImplementedError("cryptography library not available")
    keys = ts_ms.map(lambda t: derive_key_from_ts(int(t)))
    return pd.Series(
        [_aes_ecb_decrypt_one(c, k) for c, k in zip(cipher_b64, keys)]
    )


def decrypt_payload(cipher_col: Column | str, ts_col: Column | str) -> Column:
    c = F.col(cipher_col) if isinstance(cipher_col, str) else cipher_col
    t = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return aes_ecb_decrypt_with_ts(c, t)


# --- obfuscated API-key header (SURVEY §2.12; reference
# src/macro_markets/oklink/generate_apikey.py:9-31) -------------------------
#
# The explorer expects an `x-apikey` header built driver-side per request:
# the static key with its first 8 chars rotated to the end, joined with
# an obfuscated timestamp (epoch-ms + a fixed offset, plus 3 filler
# digits), base64'd. Deterministic here: the caller supplies now_ms and
# the filler, so requests are replayable and the codec round-trips in
# tests. Driver-side scalar work — never a Spark job.

_TS_OFFSET = 1_111_111_111_111


def generate_api_key(api_key: str, now_ms: int, filler: str = "000") -> str:
    """Obfuscated header value for a request issued at ``now_ms``."""
    if len(filler) != 3 or not filler.isdigit():
        raise ValueError("filler must be exactly 3 digits")
    rotated = api_key[8:] + api_key[:8]
    ts_enc = f"{now_ms + _TS_OFFSET}{filler}"
    return base64.b64encode(f"{rotated}|{ts_enc}".encode()).decode()


def parse_api_key(header: str) -> tuple[str, int]:
    """Inverse of :func:`generate_api_key` -> (original key, now_ms).
    Exists for tests and for verifying recorded requests."""
    rotated, ts_enc = base64.b64decode(header).decode().rsplit("|", 1)
    api_key = rotated[-8:] + rotated[:-8]
    return api_key, int(ts_enc[:-3]) - _TS_OFFSET
