"""Distributed binary-fuse-filter construction and probing.

Same pipeline shape as the XOR build (``spark_build.py``, SURVEY §3.1):
executor-side vectorized digesting -> distributed digest dedup (uniform by
construction, skew-free) -> driver peel over 16-byte digests only ->
broadcast artifact, map-only vectorized probe. Only the core differs
(``fuse_core.py``: segmented addressing, ~1.125n slots).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

import numpy as np

from ..kernels.column import digest_series as _digest_batch
from .fuse_core import FuseFilter, build_fuse_from_digests
from .spark_build import key_digests

__all__ = [
    "build_fuse_filter",
    "is_member_fuse",
    "probe_fuse",
    "ShardedFuseFilter",
    "build_sharded_fuse_filter",
    "is_member_sharded_fuse",
    "probe_sql_fuse",
]


def build_fuse_filter(
    df: DataFrame, key_col: str, width: int = 8, seed: int = 0
) -> FuseFilter:
    """Global fuse filter: distributed digest+dedup, driver peel."""
    uniq = key_digests(df, key_col).dropDuplicates(["d0", "d1"])
    pdf = uniq.toPandas()  # 16 bytes per *unique* key — the only collect
    d0 = pdf["d0"].to_numpy(dtype=np.int64).view(np.uint64)
    d1 = pdf["d1"].to_numpy(dtype=np.int64).view(np.uint64)
    return build_fuse_from_digests(d0, d1, width=width, seed=seed)


_FUSE_CACHE: dict[int, tuple[object, FuseFilter]] = {}


def _cached_fuse(art: dict) -> FuseFilter:
    k = id(art)
    hit = _FUSE_CACHE.get(k)
    if hit is None or hit[0] is not art:
        _FUSE_CACHE.clear()
        _FUSE_CACHE[k] = (art, FuseFilter.from_dict(art))
    return _FUSE_CACHE[k][1]


def is_member_fuse(
    spark: SparkSession, ff: FuseFilter, col: Column | str
) -> Column:
    """Vectorized membership probe column against a broadcast fuse filter."""
    bc = spark.sparkContext.broadcast(ff.to_dict())

    @pandas_udf("boolean")
    def _probe(s: pd.Series) -> pd.Series:
        f = _cached_fuse(bc.value)
        d0, d1 = _digest_batch(s)
        return pd.Series(f.contains_digests(d0, d1))

    return _probe(F.col(col) if isinstance(col, str) else col)


def probe_fuse(
    df: DataFrame, ff: FuseFilter, key_col: str, out: str = "is_member"
) -> DataFrame:
    return df.withColumn(out, is_member_fuse(df.sparkSession, ff, key_col))


# ---------------------------------------------------------------------------
# sharded (executor-parallel) construction — the 10^9+-unique-key scale path,
# mirroring spark_build.build_sharded_xor_filter: digests hash-partition into
# shards, one independent fuse filter peels per shard inside applyInPandas,
# probes route by the same shard hash. No driver peel, no global merge.
# ---------------------------------------------------------------------------


class ShardedFuseFilter:
    """A bank of independent fuse filters addressed by digest shard."""

    def __init__(
        self,
        width: int,
        seed: int,
        shards: dict[int, FuseFilter],
        num_shards: int,
        digest_kind: str = "murmur",
        mode: str = "digest",
    ):
        self.width = width
        self.seed = seed
        self.shards = shards
        self.num_shards = num_shards
        self.digest_kind = digest_kind
        # slot-addressing mode shared by every shard: 'digest' (splitmix)
        # or 'sqlhash' (Spark xxhash64-on-long semantics, SQL-probe-able)
        self.mode = mode

    def _flat(self) -> dict:
        """Flattened probe state: concatenated slot arrays + per-shard
        (offset, segment_length, segment_count, seed, present) lookup
        vectors — one vectorized gather pass per Arrow batch, no
        per-shard Python loop."""
        fl = getattr(self, "_flat_cache", None)
        if fl is not None:
            return fl
        ns = self.num_shards
        offsets = np.zeros(ns, dtype=np.int64)
        seeds = np.zeros(ns, dtype=np.uint64)
        seg_len = np.ones(ns, dtype=np.uint64)
        seg_cnt = np.ones(ns, dtype=np.uint64)
        present = np.zeros(ns, dtype=bool)
        parts, off = [], 0
        for sid in range(ns):
            f = self.shards.get(sid)
            if f is None:
                continue
            present[sid] = True
            offsets[sid] = off
            seeds[sid] = f.seed
            seg_len[sid] = f.segment_length
            seg_cnt[sid] = f.segment_count
            parts.append(f.slots)
            off += f.size
        slots = np.concatenate(parts) if parts else np.zeros(1, dtype=np.uint8)
        fl = {
            "slots": slots,
            "offsets": offsets,
            "seeds": seeds,
            "seg_len": seg_len,
            "seg_cnt": seg_cnt,
            "present": present,
        }
        self._flat_cache = fl
        return fl

    @staticmethod
    def route(d0: np.ndarray, num_shards: int) -> np.ndarray:
        s = d0.view(np.int64) % np.int64(num_shards)
        return np.where(s < 0, s + num_shards, s)

    def contains_digests(self, d0: np.ndarray, d1: np.ndarray) -> np.ndarray:
        from ..kernels.hashes import SPARK_XXHASH64_DEFAULT_SEED, splitmix64, xxh64_long
        from .fuse_core import ARITY, fuse_fingerprint

        _u = np.uint64
        fl = self._flat()
        d0 = d0.astype(_u)
        shard = self.route(d0, self.num_shards)
        sql = self.mode == "sqlhash"
        if sql:
            h = xxh64_long(
                fl["seeds"][shard],
                xxh64_long(d0, _u(SPARK_XXHASH64_DEFAULT_SEED)),
            )
            hh = xxh64_long(h, _u(SPARK_XXHASH64_DEFAULT_SEED))
        else:
            h = splitmix64(d0 ^ fl["seeds"][shard])
        q = ((h >> _u(32)) * fl["seg_cnt"][shard]) >> _u(32)
        sl = fl["seg_len"][shard]
        base = fl["offsets"][shard] + (q * sl).astype(np.int64)
        acc = np.zeros(d0.shape[0], dtype=_u)
        for j in range(ARITY):
            if sql:
                lane = xxh64_long(_u(j + 1), hh)
            else:
                lane = splitmix64(
                    h ^ _u((0x9E3779B97F4A7C15 * (j + 1)) & 0xFFFFFFFFFFFFFFFF)
                )
            idx = base + (j * sl + (lane & (sl - _u(1)))).astype(np.int64)
            acc ^= fl["slots"][idx].astype(_u)
        fp = fuse_fingerprint(d1, self.width, self.mode)
        return (acc == fp) & fl["present"][shard]

    def metrics(self) -> dict:
        n = sum(f.metrics.get("n_keys", 0) for f in self.shards.values())
        size = sum(f.size for f in self.shards.values())
        return {
            "n_keys": n,
            "total_slots": size,
            "bits_per_key": size * self.width / max(n, 1),
            "num_shards": self.num_shards,
        }


def _fuse_artifact_row(sid: int, f: FuseFilter) -> pd.DataFrame:
    import json

    meta = f.to_dict()
    slots_hex = meta.pop("slots_hex")
    return pd.DataFrame(
        {
            "shard": [sid],
            "meta": [json.dumps(meta)],
            "slots": [bytes.fromhex(slots_hex)],
        }
    )


def fuse_shard_build_kernel(width: int, seed: int, addressing: str = "digest"):
    """applyInPandas kernel: one (d0, d1, shard) group -> one fuse
    artifact row. In-shard dedup (duplicates share d0, hence a shard)."""
    from .spark_build import _dedup_digests

    def build_one(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["shard"].iloc[0])
        d0 = pdf["d0"].to_numpy(dtype=np.int64).view(np.uint64)
        d1 = pdf["d1"].to_numpy(dtype=np.int64).view(np.uint64)
        d0, d1 = _dedup_digests(d0, d1)
        f = build_fuse_from_digests(
            d0, d1, width=width, seed=seed ^ (sid * 0x9E37),
            assume_unique=True, mode=addressing,
        )
        return _fuse_artifact_row(sid, f)

    return build_one


def build_sharded_fuse_filter(
    df: DataFrame,
    key_col: str,
    num_shards: int = 32,
    width: int = 8,
    seed: int = 0,
    jvm_digests: bool = False,
    addressing: str | None = None,
) -> ShardedFuseFilter:
    """One shuffle of 16-byte digest rows, per-shard fuse peel in
    applyInPandas, per-shard deterministic seeds — artifacts are
    rebuild-stable across runs and partitionings. ``jvm_digests=True``
    computes (d0, d1) in whole-stage codegen so no raw key string ever
    crosses the Arrow boundary (same scale trick as the XOR path, D7).

    ``addressing`` defaults to 'sqlhash' for jvm-digest builds — making
    the filter probe-able with zero Python via ``probe_sql_fuse`` — and
    'digest' (splitmix) for the murmur byte-parity path, mirroring
    ``build_sharded_xor_filter``."""
    import json

    from .spark_build import key_digests, key_digests_jvm

    if addressing is None:
        addressing = "sqlhash" if jvm_digests else "digest"
    digest_fn = key_digests_jvm if jvm_digests else key_digests
    dig = digest_fn(df, key_col).withColumn(
        "shard", F.pmod(F.col("d0"), F.lit(num_shards)).cast("int")
    )
    build_one = fuse_shard_build_kernel(width, seed, addressing)
    res = (
        dig.repartition(num_shards, "shard")
        .groupBy("shard")
        .applyInPandas(build_one, schema="shard int, meta string, slots binary")
        .toPandas()
    )
    shards = {}
    for r in res.itertuples(index=False):
        d = json.loads(r.meta)
        d["slots_hex"] = bytes(r.slots).hex()
        shards[int(r.shard)] = FuseFilter.from_dict(d)
    return ShardedFuseFilter(
        width, seed, shards, num_shards,
        "xxhash64jvm" if jvm_digests else "murmur",
        addressing,
    )


def is_member_sharded_fuse(
    spark: SparkSession, sff: ShardedFuseFilter, col: Column | str
) -> Column:
    """Vectorized probe against a broadcast sharded fuse filter. Routes
    by the same digest kind the build used."""
    from ..kernels.hashes import digest128
    from ..kernels.column import series_to_bytes as _series_to_bytes
    from .spark_build import jvm_digest_cols

    bc = spark.sparkContext.broadcast(
        {
            "width": sff.width,
            "seed": sff.seed,
            "num_shards": sff.num_shards,
            "digest_kind": sff.digest_kind,
            "mode": sff.mode,
            "shards": {str(k): v.to_dict() for k, v in sff.shards.items()},
        }
    )

    def _rebuild(art: dict) -> ShardedFuseFilter:
        return ShardedFuseFilter(
            art["width"],
            art["seed"],
            {int(k): FuseFilter.from_dict(v) for k, v in art["shards"].items()},
            art["num_shards"],
            art["digest_kind"],
            art.get("mode", "digest"),
        )

    if sff.digest_kind == "xxhash64jvm":

        @pandas_udf("boolean")
        def _probe_jvm(d0: pd.Series, d1: pd.Series) -> pd.Series:
            f = _cached_sharded_fuse(bc.value, _rebuild)
            return pd.Series(
                f.contains_digests(
                    d0.to_numpy(dtype=np.int64).view(np.uint64),
                    d1.to_numpy(dtype=np.int64).view(np.uint64),
                )
            )

        c0, c1 = jvm_digest_cols(col)
        return _probe_jvm(c0, c1)

    @pandas_udf("boolean")
    def _probe(s: pd.Series) -> pd.Series:
        f = _cached_sharded_fuse(bc.value, _rebuild)
        from ..kernels.column import digest_series

        d0, d1 = digest_series(s)
        return pd.Series(f.contains_digests(d0, d1))

    return _probe(F.col(col) if isinstance(col, str) else col)


_SHARDED_FUSE_CACHE: dict[int, tuple[object, "ShardedFuseFilter"]] = {}


def _cached_sharded_fuse(art: dict, rebuild) -> "ShardedFuseFilter":
    k = id(art)
    hit = _SHARDED_FUSE_CACHE.get(k)
    if hit is None or hit[0] is not art:
        _SHARDED_FUSE_CACHE.clear()
        _SHARDED_FUSE_CACHE[k] = (art, rebuild(art))
    return _SHARDED_FUSE_CACHE[k][1]


def probe_sql_fuse(
    sff: ShardedFuseFilter,
    df: DataFrame,
    key_col: str,
    out_col: str = "is_member",
) -> DataFrame:
    """Zero-Python fuse-filter probe, fully inside whole-stage codegen
    (the fuse counterpart of ``spark_build.probe_sql``, SURVEY §7 D9).

    Requires ``jvm_digests=True`` + ``addressing='sqlhash'``: digests are
    ``xxhash64`` of the key and slot addressing uses only builtins the JVM
    recomputes exactly. Fuse addressing is *simpler* in SQL than XOR's:
    the window segment is fastrange on the high 32 bits (the product
    ``(h >>> 32) * segment_count`` stays below 2^63 — no unsigned-mod
    correction constants) and in-segment offsets are power-of-two masks
    (``& (segment_length-1)`` on a signed long equals the unsigned low
    bits). Plan: per-shard parameters via a tiny broadcast join, three
    index columns in pure codegen, then three broadcast hash joins against
    the flattened slot table. The three slots live in consecutive
    segments, preserving the paper's locality argument even through the
    join's hash relation (arXiv:2201.01174 §3).

    Reuse note: keep the returned DataFrame across actions — each new
    plan instance rebuilds the slot-table broadcasts.
    """
    from .spark_build import _JVM_D1_SALT, _slots_frame
    from .xor_core import FP_SEED_SIGNED

    if sff.digest_kind != "xxhash64jvm" or sff.mode != "sqlhash":
        raise ValueError(
            "probe_sql_fuse requires a filter built with jvm_digests=True "
            f"and addressing='sqlhash' (got digest_kind={sff.digest_kind!r}, "
            f"mode={sff.mode!r}); use is_member_sharded_fuse instead"
        )
    spark = df.sparkSession
    ns = sff.num_shards
    t = "__fusesql_"
    mask_bits = {8: 0xFF, 16: 0xFFFF, 32: 0xFFFFFFFF}[sff.width]

    # per-shard probe parameters: flat-table offset, attempt seed (signed
    # view), segment_count, segment_length, its power-of-two mask, present
    params_df = getattr(sff, "_params_df_cache", None)
    if params_df is None or params_df[0] is not spark:
        fl = sff._flat()
        pdf = pd.DataFrame(
            {
                f"{t}sh": np.arange(ns, dtype=np.int32),
                f"{t}off": fl["offsets"],
                f"{t}sd": fl["seeds"].view(np.int64),
                f"{t}sc": fl["seg_cnt"].view(np.int64),
                f"{t}sl": fl["seg_len"].view(np.int64),
                f"{t}slm": fl["seg_len"].view(np.int64) - 1,
                f"{t}pres": fl["present"],
            }
        )
        params_df = (spark, spark.createDataFrame(pdf))
        sff._params_df_cache = params_df
    params = params_df[1]

    key = F.col(key_col)
    base = (
        df.withColumns(
            {
                f"{t}d0": F.xxhash64(key),
                f"{t}d1": F.xxhash64(key, F.lit(_JVM_D1_SALT)),
            }
        )
        .withColumn(f"{t}shard", F.pmod(F.col(f"{t}d0"), F.lit(ns)).cast("int"))
        .withColumnRenamed(f"{t}shard", f"{t}sh")
        .join(F.broadcast(params), f"{t}sh")
        # h = xxhash64(d0, seed): the one hash every slot index derives from
        .withColumn(f"{t}h", F.xxhash64(F.col(f"{t}d0"), F.col(f"{t}sd")))
    )
    q = F.shiftright(
        F.shiftrightunsigned(F.col(f"{t}h"), 32) * F.col(f"{t}sc"), 32
    )
    base = base.withColumns(
        {
            # the lane literal MUST be a long: xxhash64 of an int column
            # takes Spark's 4-byte hashInt path, not the hashLong the
            # NumPy build kernel replicates
            f"{t}i{j}": F.col(f"{t}off")
            + (q + F.lit(j)) * F.col(f"{t}sl")
            + F.xxhash64(
                F.col(f"{t}h"), F.lit(j + 1).cast("long")
            ).bitwiseAND(F.col(f"{t}slm"))
            for j in range(3)
        }
    ).withColumn(
        f"{t}fp",
        F.xxhash64(F.col(f"{t}d1"), F.lit(FP_SEED_SIGNED)).bitwiseAND(
            F.lit(int(mask_bits))
        ),
    )
    # prune before the joins: digests, h, q and the parameter columns are
    # dead past this point
    base = base.select(
        *df.columns, *[f"{t}i{j}" for j in range(3)], f"{t}fp", f"{t}pres"
    )
    slots_df = _slots_frame(spark, sff)
    for j in range(3):
        sj = slots_df.select(
            F.col("sidx").alias(f"{t}i{j}"), F.col("sval").alias(f"{t}v{j}")
        )
        base = base.join(F.broadcast(sj), f"{t}i{j}")
    member = (
        F.col(f"{t}v0")
        .bitwiseXOR(F.col(f"{t}v1"))
        .bitwiseXOR(F.col(f"{t}v2"))
        == F.col(f"{t}fp")
    ) & F.col(f"{t}pres")
    return base.withColumn(out_col, member).select(*df.columns, out_col)
