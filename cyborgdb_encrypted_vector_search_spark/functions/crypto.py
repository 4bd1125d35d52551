"""Encrypted-at-rest vector columns.

The reference's "CyborgDB" store is a stub that replaces every vector
with the placeholder string "ENCRYPTED_VECTOR" (reference
src/cyborgdb_store.py:4-11) to model the thesis *ciphertext vectors are
useless to an exfiltration scan*. Here that intent is implemented for
real with Spark's built-in ``aes_encrypt``/``aes_decrypt`` (JVM-side,
Spark >= 3.3): the embedding is serialized to JSON, AES-GCM encrypted,
and stored as a BINARY column. A full scan of the encrypted table (the
reference's "leak", src/chromadb_store.py:10-12) yields ciphertext only;
decryption requires the key and restores the exact float array.

GCM is randomized (fresh IV per row) — identical plaintexts produce
distinct ciphertexts, so ciphertext equality leaks nothing. All
column expressions; en/decryption of a 100 TB table is a scan-project
job with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def encrypt_vector(col: Column | str, key: str) -> Column:
    """array<float|double> → BINARY ciphertext (AES-GCM, random IV)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_encrypt(F.to_json(c).cast("binary"), F.lit(key))


def decrypt_vector(col: Column | str, key: str) -> Column:
    """BINARY ciphertext → array<double> (exact round-trip)."""
    c = F.col(col) if isinstance(col, str) else col
    plain = F.aes_decrypt(c, F.lit(key)).cast("string")
    return F.from_json(plain, "array<double>")


def encrypt_text(col: Column | str, key: str) -> Column:
    """StringType → BINARY ciphertext (for document bodies)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_encrypt(c.cast("binary"), F.lit(key))


def decrypt_text(col: Column | str, key: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_decrypt(c, F.lit(key)).cast("string")
