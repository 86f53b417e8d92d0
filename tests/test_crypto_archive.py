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
