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
    pad = plain[-1]
    if not 1 <= pad <= 16:  # tolerate unpadded payloads (CryptoJS quirk)
        return plain.decode("utf-8", errors="replace")
    return plain[:-pad].decode("utf-8", errors="replace")


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
