"""Salted join for skewed keys.

At 100 TB a handful of hot keys (one viral conv_id, one default
user_id) can pin an entire shuffle behind a single reducer. AQE's
skew-join split helps sort-merge joins after the fact; the classic
explicit fix — and the only one that also works for aggregations
feeding a join — is salting:

- the BIG side gets a deterministic salt in [0, S) derived from a
  high-entropy column (``xxhash64 % S``), splitting each hot key's rows
  across S reducers;
- the SMALL side is replicated S times (explode over a literal salt
  array — S copies of a dimension table is still tiny);
- the join key becomes (key, salt), so every reducer holds a complete
  copy of the dimension rows it needs and the hot key's work is spread
  S ways.

Results are row-for-row identical to the unsalted join (verified by the
``q_salted_skew_join`` driver-contract oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_src: Column | str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` to ``small`` on ``on`` with an S-way salt.

    ``salt_src`` must be a big-side expression with per-row entropy
    (a unique id, a timestamp) — NOT the join key itself, or every row
    of a hot key lands on the same salt again.
    """
    salt = F.pmod(F.xxhash64(salt_src), F.lit(num_salts)).cast("int")
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(num_salts)])),
    )
    return b.join(s, [on, "__salt"], how).drop("__salt")
