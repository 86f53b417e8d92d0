"""T13 (AES payload decrypt UDF) and S11 (verified archive restore)."""

from __future__ import annotations

import base64
import hashlib
import sqlite3
import tarfile

import pytest

from pyspark.sql import functions as F

from clx_etl_spark.functions import crypto as C
from clx_etl_spark.sources import archive as A


def _encrypt(plain: str, ts_ms: int) -> str:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    key = C.derive_key_from_ts(ts_ms)
    data = plain.encode()
    pad = 16 - len(data) % 16
    data += bytes([pad]) * pad
    enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
    return base64.b64encode(enc.update(data) + enc.finalize()).decode()


def test_aes_decrypt_udf_roundtrip(spark):
    rows = [
        (i, 1_700_000_000_000 + i, f'{{"tag": "entity-{i}", "v": {i}}}')
        for i in range(6)
    ]
    df = spark.createDataFrame(
        [(i, ts, _encrypt(plain, ts)) for i, ts, plain in rows],
        "id long, ts long, cipher string",
    )
    out = df.select("id", C.decrypt_payload("cipher", "ts").alias("plain")).collect()
    got = {r.id: r.plain for r in out}
    for i, _, plain in rows:
        assert got[i] == plain


def test_aes_unpad_edge_cases():
    """Unpad must verify the whole PKCS7 tail: a genuinely-unpadded payload
    whose last byte happens to land in 0x01-0x10 must not be truncated, and
    an empty plaintext must not raise."""
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    ts = 1_700_000_000_000
    key = C.derive_key_from_ts(ts)

    def raw_encrypt(data: bytes) -> str:
        enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
        return base64.b64encode(enc.update(data) + enc.finalize()).decode()

    # 16 bytes, no padding, last byte 0x02 but second-to-last is not: keep all
    tricky = b"unpadded-tail-\x31\x02"
    assert C._aes_ecb_decrypt_one(raw_encrypt(tricky), key) == tricky.decode(
        "utf-8", errors="replace"
    )
    # empty ciphertext -> empty plaintext, no IndexError
    assert C._aes_ecb_decrypt_one(raw_encrypt(b""), key) == ""
    # well-formed padding still stripped
    assert C._aes_ecb_decrypt_one(_encrypt("abc", ts), key) == "abc"


def test_api_key_header_roundtrip():
    """S9 keygen: rotate-8 + offset-ts + filler, base64 — and its inverse."""
    key = "a2c903cc-b31e-4547-9299-b6d07b7631ab"
    now = 1_700_000_000_000
    header = C.generate_api_key(key, now, filler="123")
    # header embeds the rotated key, not the raw one
    assert key not in base64.b64decode(header).decode().split("|")[0][: len(key) - 8]
    assert C.parse_api_key(header) == (key, now)
    with pytest.raises(ValueError):
        C.generate_api_key(key, now, filler="12")


def test_aes_decrypt_null_passthrough(spark):
    df = spark.createDataFrame([(1, 1_700_000_000_000, None)], "id long, ts long, cipher string")
    assert df.select(C.decrypt_payload("cipher", "ts").alias("p")).first().p is None


@pytest.fixture
def archive(tmp_path):
    db = tmp_path / "snapshot.db"
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE market_snapshot (ts INTEGER, symbol TEXT, exchange_id INTEGER, px REAL)")
    con.executemany(
        "INSERT INTO market_snapshot VALUES (?,?,?,?)",
        [(1000 + i, "BTCUSDT" if i % 2 else "ETHUSDT", i % 3, 1.5 * i) for i in range(100)],
    )
    con.commit()
    con.close()
    tar_path = tmp_path / "snap.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tar:
        tar.add(db, arcname="snapshot.db")
    sha = hashlib.sha256(tar_path.read_bytes()).hexdigest()
    return str(tar_path), sha


def test_restore_archive_predicate_scan(spark, archive):
    path, sha = archive
    df = A.restore_archive(
        spark, path, sha, "market_snapshot",
        where="symbol = ? AND ts >= ?", params=("BTCUSDT", 1050),
    )
    rows = df.collect()
    assert all(r.symbol == "BTCUSDT" and r.ts >= 1050 for r in rows)
    assert len(rows) == 25
    assert set(df.columns) == {"ts", "symbol", "exchange_id", "px"}


def test_restore_archive_rejects_bad_digest(spark, archive):
    path, _ = archive
    with pytest.raises(A.ArchiveIntegrityError):
        A.restore_archive(spark, path, "0" * 64, "market_snapshot")
