"""Portable 56-bit hash — one definition, two engines.

Every hash-dependent operator (minhash, simhash, LSH, fingerprints) must be
*checkable against the DuckDB oracle*, so the hash has to produce identical
values in Spark SQL and DuckDB SQL. Neither engine's native hash matches the
other (Spark: murmur3/xxhash64; DuckDB: its own), but both expose md5 as a hex
string, and 14 hex chars (56 bits) fit a signed BIGINT in both. This costs a
few cycles vs xxhash64 but buys bit-exact cross-engine verifiability; at 100 TB
you may swap `portable_hash64` for `F.xxhash64` (one line) once verified.

Spark :  cast(conv(substr(md5(s), 1, 14), 16, 10) as bigint)
DuckDB:  ('0x' || substr(md5(s), 1, 14))::BIGINT
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

HASH_BITS = 56
HASH_MOD = 1 << HASH_BITS


def portable_hash64(col: Column | str) -> Column:
    """56-bit deterministic hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 14), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str) -> str:
    """Same hash, DuckDB SQL rendering."""
    return f"(('0x' || substr(md5({expr}), 1, 14))::BIGINT)"


def portable_hash64_py(s: str) -> int:
    """Driver-side (plain Python) rendering of the SAME hash — for
    precomputing small deterministic model tables (e.g. the classifier
    weight array, LSH hyperplanes) that both engines then consume as
    literals. Must stay in lockstep with the two SQL renderings above."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def seeded_hash(col: Column | str, seed: int) -> Column:
    """Family of independent hashes h_i(x) = H(x || '#' || i) — the minhash
    'permutation' family."""
    c = F.col(col) if isinstance(col, str) else col
    return portable_hash64(F.concat(c, F.lit(f"#{seed}")))


def fast_seeded_hash(col: Column | str, seed: int) -> Column:
    """The documented at-scale swap for `seeded_hash`: xxhash64 with the seed
    as a hashed sibling column — JVM-native, no md5 hex detour, masked to
    the same 56-bit range so every downstream band/fold shape is unchanged.

    NOT oracle-portable (DuckDB has no xxhash64), so NO graded query may use
    it — it exists for the 100 TB deployment where cross-engine verification
    has already happened at small SF and the md5 tax (a hex format + string
    conv per hash call) dominates the signature stage. Measured A/B:
    tools/stress_probe.py round8_xxhash."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c, F.lit(seed)).bitwiseAND(F.lit(HASH_MOD - 1)).cast("bigint")


def seeded_hash_sql(expr: str, seed: int) -> str:
    return portable_hash64_sql(f"({expr} || '#{seed}')")
