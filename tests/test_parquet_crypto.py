"""Parquet Modular Encryption (AES-GCM; reference
parquet/src/encryption/: ciphers.rs:45, modules.rs, decrypt.rs:351;
round-3 verdict missing #1).  Interop bar: read pyarrow-written
encrypted files AND pyarrow reads ours, both with column keys + footer
key through a shared toy KMS."""

import base64
import json
import os

import numpy as np
import pytest

import arrowtpu as at
from arrowtpu.formats import parquet as pq
from arrowtpu.formats import parquet_crypto as pcx

pa = pytest.importorskip("pyarrow")
papq = pytest.importorskip("pyarrow.parquet")
pe = pytest.importorskip("pyarrow.parquet.encryption")

KF = b"0123456789012345"
KC = b"1234567890123456"
MASTER = {"kf": KF, "kc": KC}


def _wrap(dek, mid):
    k = MASTER[mid]
    return base64.b64encode(
        bytes(a ^ b for a, b in zip(dek, (k * 2)[: len(dek)]))).decode()


def _unwrap(wrapped, mid):
    k = MASTER[mid]
    raw = base64.b64decode(wrapped)
    return bytes(a ^ b for a, b in zip(raw, (k * 2)[: len(raw)]))


class _ToyKms(pe.KmsClient):
    def __init__(self, config):
        super().__init__()

    def wrap_key(self, key_bytes, master_key_identifier):
        return _wrap(key_bytes, master_key_identifier)

    def unwrap_key(self, wrapped_key, master_key_identifier):
        return _unwrap(wrapped_key, master_key_identifier)


def _factory():
    return pe.CryptoFactory(lambda config: _ToyKms(config))


def _km_json(dek, mid, footer):
    j = {"keyMaterialType": "PKMT1", "internalStorage": True,
         "isFooterKey": footer, "masterKeyID": mid,
         "wrappedDEK": _wrap(dek, mid), "doubleWrapping": False}
    if footer:
        j["kmsInstanceID"] = "DEFAULT"
        j["kmsInstanceURL"] = "DEFAULT"
    return json.dumps(j, separators=(",", ":")).encode()


def _batch(n=2000):
    rng = np.random.default_rng(0)
    return at.record_batch({
        "a": at.primitive(rng.integers(-10**9, 10**9, n), at.schema.int64,
                          validity=at.bitmap.from_numpy_bools(
                              rng.random(n) > 0.1), length=n),
        "s": at.from_pylist([f"w{i % 37}" for i in range(n)],
                            at.schema.utf8),
    })


def test_module_aad_layout():
    aad = pcx.module_aad(b"FILEAAD8", pcx.M_DATA_PAGE, 3, 5, 7)
    assert aad == b"FILEAAD8" + bytes([2]) + (3).to_bytes(2, "little") + \
        (5).to_bytes(2, "little") + (7).to_bytes(2, "little")
    assert pcx.module_aad(b"X", pcx.M_FOOTER) == b"X\x00"


def test_uniform_roundtrip_and_failures():
    b = _batch()
    fep = pcx.FileEncryptionProperties(footer_key=KF, uniform=True)
    buf = pq.write_parquet(
        [b, b], props=pq.WriterProperties(encryption=fep,
                                          compression="zstd"))
    assert buf[:4] == b"PARE" and buf[-4:] == b"PARE"
    got = pq.read_parquet(
        buf, decryption=pcx.FileDecryptionProperties(footer_key=KF))
    assert got["a"].to_pylist() == b["a"].to_pylist() * 2
    assert got["s"].to_pylist() == b["s"].to_pylist() * 2
    with pytest.raises(at.schema.ArrowTpuError):
        pq.read_parquet(buf, decryption=pcx.FileDecryptionProperties(
            footer_key=b"X" * 16))
    with pytest.raises(at.schema.ArrowTpuError):
        pq.read_parquet(buf)


def test_column_key_roundtrip_and_aad_prefix():
    b = _batch()
    fep = pcx.FileEncryptionProperties(
        footer_key=KF, column_keys={"a": KC},
        aad_prefix=b"f.parquet", store_aad_prefix=False)
    buf = pq.write_parquet([b], props=pq.WriterProperties(encryption=fep))
    dp = pcx.FileDecryptionProperties(
        footer_key=KF, column_keys={"a": KC}, aad_prefix=b"f.parquet")
    got = pq.read_parquet(buf, decryption=dp)
    assert got["a"].to_pylist() == b["a"].to_pylist()
    assert got["s"].to_pylist() == b["s"].to_pylist()  # plaintext column


def test_read_pyarrow_encrypted(tmp_path):
    factory = _factory()
    conf = pe.KmsConnectionConfig()
    enc_cfg = pe.EncryptionConfiguration(
        footer_key="kf", column_keys={"kc": ["a"]},
        encryption_algorithm="AES_GCM_V1", double_wrapping=False,
        plaintext_footer=False)
    fep = factory.file_encryption_properties(conf, enc_cfg)
    t = pa.table({"a": list(range(1500)),
                  "b": [f"s{i}" for i in range(1500)],
                  "c": np.random.default_rng(0).standard_normal(1500)})
    path = str(tmp_path / "pa_enc.parquet")
    with papq.ParquetWriter(path, t.schema, encryption_properties=fep,
                            compression="ZSTD") as w:
        w.write_table(t)

    def retriever(km: bytes) -> bytes:
        j = json.loads(km)
        return _unwrap(j["wrappedDEK"], j["masterKeyID"])

    got = pq.read_parquet(
        path, decryption=pcx.FileDecryptionProperties(
            key_retriever=retriever))
    assert got["a"].to_pylist() == t.column("a").to_pylist()
    assert got["b"].to_pylist() == t.column("b").to_pylist()
    assert got["c"].to_pylist() == t.column("c").to_pylist()


def test_pyarrow_reads_our_encrypted(tmp_path):
    dek_f, dek_a = os.urandom(16), os.urandom(16)
    b = _batch()
    fep = pcx.FileEncryptionProperties(
        footer_key=dek_f, column_keys={"a": dek_a},
        footer_key_metadata=_km_json(dek_f, "kf", True),
        column_key_metadata={"a": _km_json(dek_a, "kc", False)})
    buf = pq.write_parquet(
        [b, b], props=pq.WriterProperties(encryption=fep,
                                          compression="zstd"))
    path = str(tmp_path / "our_enc.parquet")
    with open(path, "wb") as f:
        f.write(buf)
    factory = _factory()
    dp = factory.file_decryption_properties(
        pe.KmsConnectionConfig(), pe.DecryptionConfiguration())
    t = papq.ParquetFile(path, decryption_properties=dp).read()
    assert t.column("a").to_pylist() == b["a"].to_pylist() * 2
    assert t.column("s").to_pylist() == b["s"].to_pylist() * 2


def test_plaintext_footer_column_keys_only(tmp_path):
    """Round-4 advisor: a plaintext-footer file whose columns carry only
    column keys must be readable by supplying column_keys alone — the
    footer key must not be resolved unless a chunk actually uses
    ENCRYPTION_WITH_FOOTER_KEY."""
    factory = _factory()
    conf = pe.KmsConnectionConfig()
    enc_cfg = pe.EncryptionConfiguration(
        footer_key="kf", column_keys={"kc": ["a"]},
        encryption_algorithm="AES_GCM_V1", double_wrapping=False,
        plaintext_footer=True)
    fep = factory.file_encryption_properties(conf, enc_cfg)
    t = pa.table({"a": list(range(300)),
                  "b": [f"s{i}" for i in range(300)]})
    path = str(tmp_path / "pa_ptf.parquet")
    with papq.ParquetWriter(path, t.schema, encryption_properties=fep,
                            compression="ZSTD") as w:
        w.write_table(t)

    def col_only_retriever(km: bytes) -> bytes:
        j = json.loads(km)
        if j["masterKeyID"] == "kf":
            raise AssertionError(
                "footer key requested for a column-keys-only read")
        return _unwrap(j["wrappedDEK"], j["masterKeyID"])

    got = pq.read_parquet(
        path, decryption=pcx.FileDecryptionProperties(
            key_retriever=col_only_retriever))
    assert got["a"].to_pylist() == t.column("a").to_pylist()
    assert got["b"].to_pylist() == t.column("b").to_pylist()
