#!/usr/bin/env python3
"""Generate the cross-implementation PME interop fixture.

Writes src/test/resources/interop/people_pme.parquet with PyArrow's
parquet encryption (the other major PME implementation), using the same
writer configuration as the reference demo (write_encrypted_parquet.py:
67-87): AES_GCM_V1, 256-bit DEKs, double wrapping, internal key
material, plaintext footer signed with the PUBLIC KEK, and the demo
column->KEK policy. The KMS client here wraps/unwraps locally with
RFC 3394 AES KeyWrap over the fixture KEKs (kms_server.py:29-32) — the
same cryptography our TestKmsServer exposes over HTTP, so the JVM side
can unwrap every key.

InteropSpec (Scala) then reads this file through Spark + parquet-mr at
each privilege level: if parquet-mr's KeyToolkit can decrypt a
PyArrow-written file, the key-material format, wrapping scheme, and
algorithm configuration are genuinely interoperable (SURVEY.md §7
risk 5).

Tool-only script: the engine itself has no Python dependency.
"""
import base64
import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.parquet.encryption as pe
from cryptography.hazmat.primitives.keywrap import aes_key_wrap, aes_key_unwrap

KEKS = {
    "PUBLIC":       "960f87a5e2eb7d07e67892cbdd60d94053d43f3c26e2bca1c52a6efd3572b8d0",
    "INTERNAL":     "fb0d234a0b650ca3382bb7f481db2f96c7bccaf66f99b9160811c1cacb3f616d",
    "CONFIDENTIAL": "efdbe2afc153a13dae44b7415c4ef0d08cc1eaec75f5029220ec738141090bf2",
    "RESTRICTED":   "ab4ae72b44fc91c8c2b5e559855a5eded40595ce423cde6b6435e2821da72c44",
}
KEKS = {k: bytes.fromhex(v) for k, v in KEKS.items()}


class LocalWrapKms(pe.KmsClient):
    """In-process stand-in for the KMS server: same KEKs, same RFC 3394
    wrap — byte-identical results to TestKmsServer's /wrap endpoint."""

    def __init__(self, config):
        pe.KmsClient.__init__(self)

    def wrap_key(self, key_bytes, master_key_identifier):
        wrapped = aes_key_wrap(KEKS[master_key_identifier], key_bytes)
        return base64.b64encode(wrapped).decode()

    def unwrap_key(self, wrapped_key, master_key_identifier):
        return aes_key_unwrap(KEKS[master_key_identifier],
                              base64.b64decode(wrapped_key))


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "..",
                           "src", "test", "resources", "interop")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "people_pme.parquet")

    # The reference demo table (write_encrypted_parquet.py:32-65).
    table = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "date_of_birth": pa.array(
            [datetime.date(1988, 2, 17), datetime.date(1989, 2, 6),
             datetime.date(2020, 1, 25)], pa.date32()),
        "first_name": pa.array(["Mike", "Rey", "Todd"]),
        "last_name": pa.array(["Truk", "McSriff", "Bonzalez"]),
        "social_security_number": pa.array(
            ["123-45-6789", "234-56-7890", "345-67-8901"]),
    })

    factory = pe.CryptoFactory(LocalWrapKms)
    encryption_props = factory.file_encryption_properties(
        pe.KmsConnectionConfig(),
        pe.EncryptionConfiguration(
            footer_key="PUBLIC",
            column_keys={
                "INTERNAL": ["date_of_birth"],
                "CONFIDENTIAL": ["first_name", "last_name"],
                "RESTRICTED": ["social_security_number"],
            },
            encryption_algorithm="AES_GCM_V1",
            data_key_length_bits=256,
            double_wrapping=True,
            internal_key_material=True,
            plaintext_footer=True,
        ))
    with pq.ParquetWriter(out, table.schema,
                          encryption_properties=encryption_props) as w:
        w.write_table(table)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
