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


def skew_aware_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    phi_e6: int = 20_000,
    mg_k: int = 256,
    how: str = "inner",
) -> DataFrame:
    """Differentiated skew join: detect heavy-hitter join keys with ONE
    mergeable Misra-Gries pass over the big side, then route them around
    the shuffle entirely.

    Salting spreads a hot key across S reducers but still shuffles every
    hot row; the strictly better plan — when the OTHER side is a keyed
    table — is to split the key space:

    - **hot keys** (MG candidates for count > phi*N; MG completeness
      guarantees no true heavy hitter is missed when phi > 1/(k+1)):
      join against a **broadcast of just those keys' rows** from the
      small side — <= k keys by construction, so this broadcast is tiny
      even when ``small`` itself is far past broadcast size. Hot rows
      never shuffle; no reducer ever sees a hot key.
    - **cold keys**: the plain co-partitioned join, now provably free of
      reducer-pinning keys (anything the detector missed is below the
      phi floor).

    Over-detection is harmless (a few extra keys ride the broadcast);
    under-detection is impossible within MG's bound — which is why the
    detector needs no second exact pass. Results are row-identical to
    the plain join (``q_skew_aware_join`` oracle); ``how`` supports
    'inner' and 'left' (NULL join keys route to the cold branch so LEFT
    retains them).

    At 100 TB: detection is one map-side-combined sketch pass (k-sized
    states merge on the driver); the split predicates are broadcast
    literal IN-lists; total shuffle volume = cold rows only.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_aware_join supports inner/left, got {how!r}")
    from ..sketches.base import aggregate as sk_aggregate
    from ..sketches.misra_gries import MisraGriesSketch

    mg = MisraGriesSketch(k=mg_k, key_col=on)
    state = sk_aggregate(big.select(on), [on], mg)
    hot = sorted(
        x.item() if hasattr(x, "item") else x
        for x in mg.heavy_hitters(state, phi_e6 / 1e6)
    )
    if not hot:
        return big.join(small, on, how)
    key = F.col(on)
    hot_pred = key.isin(hot)
    cold_pred = key.isNull() | ~key.isin(hot)
    hot_join = big.filter(hot_pred).join(
        F.broadcast(small.filter(hot_pred)), on, how
    )
    cold_join = big.filter(cold_pred).join(small.filter(cold_pred), on, how)
    return hot_join.unionByName(cold_join)
