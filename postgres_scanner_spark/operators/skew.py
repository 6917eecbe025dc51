"""Skew-handling join helpers (SURVEY.md §4).

AQE's skew-join splitting handles most runtime skew; `salted_join`
is the explicit fallback for pathological hot keys (a handful of keys
holding most rows — the classic power-law user_id/document-source
case in training-data pipelines):

  big ⋈ small on k   →   big+salt ⋈ (small × salt_range) on (k, salt)

The hot key's rows spread over `salt` partitions instead of one
straggler task; the small side replicates `salt`-fold (bounded —
it's the broadcast-able side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str, *,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Join `big` to `small` on `key` with an N-way salt.

    `big` gets a random-but-deterministic salt from a hash of its full
    row position (pmod of xxhash over the key + a per-row monotonic
    component would break determinism; a hash of the key alone would
    put the whole hot key in one bucket — so the salt hashes key and a
    row-local discriminator column when provided, else sprays with
    `spark_partition_id`-independent modulo over a sequence column).
    """
    big_salted = big.withColumn(
        "_salt", (F.pmod(F.xxhash64(*big.columns), F.lit(salt))).cast("int"))
    salt_range = F.explode(
        F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    small_rep = small.select("*", salt_range)
    out = big_salted.join(small_rep, [key, "_salt"], how)
    return out.drop("_salt")
