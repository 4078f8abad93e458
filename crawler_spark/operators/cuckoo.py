"""Sharded cuckoo filter — the seen-set prefilter's second backend.

The north-star target names "bloom/cuckoo URL-seen" explicitly; this
is the cuckoo half, a partial-key cuckoo filter (Fan, Andersen,
Kaminsky, Mitzenmacher: "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT 2014, public): 16-bit fingerprints in 4-slot buckets,
partner bucket by the standard xor trick ``i2 = i1 ^ H(f)``, bounded
eviction kicks, and a per-shard stash so inserts NEVER silently fail
— the engine's no-false-negative invariant (a lost seen mark re-crawls
a URL) survives table pressure.

vs the ``ShardedBloom`` backend (operators/bloom.py):

- **deletion**: removing one copy of (bucket, fingerprint) supports
  the reference's reload un-mark (engine/schedule.go:350-364) as a
  first-class filter op — a bloom can only over-approximate deletes.
- **lookup cost**: 2 bucket reads (8 slots) vs k scattered bit
  probes; same vectorized numpy probe shape.
- **space**: ~16.6 bits/key at 95% load for fpp ≈ 2b/2^16 ≈ 1.2e-4 —
  denser than a bloom at equal fpp.

``ShardedCuckoo`` mirrors ``ShardedBloom``'s API surface exactly
(build / fold / check / check_broadcast / store_bytes, same
``(shard int, bits binary)`` store schema), so the engine swaps
backends via ``EngineConfig.seen_filter`` with zero changes to the
eligibility dataflow. Inserts are incremental by nature (fold loads
the shard table and inserts the delta keys — no rebuild, no OR-merge
approximation); the insert loop is per-shard-local python over a
numpy table (delta-bounded: ≤ batch_size/P keys per shard per fold),
while the hot path — probing the whole frontier every round — is
fully vectorized.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_HEX_RE = re.compile(r"^[0-9a-f]{32}$")
_FP_MASK = 0xFFFF  # 16-bit fingerprints, 0 = empty slot
_BUCKET = 4  # slots per bucket (the paper's sweet spot)
_MAX_KICKS = 500  # eviction bound before falling back to the stash
# odd multiplier fingerprint mix for the partner bucket (MurmurHash2
# constant); keeps i2 = i1 ^ H(f) well-spread for 16-bit f
_MIX = np.uint64(0x5BD1E995)


def _norm_keys(vals) -> list:
    """md5-hex-normalize keys: md5-shaped strings pass through,
    anything else is md5'd (same contract as BloomFilter._probes).
    The common all-md5 case is validated with ONE C-level regex pass
    so the per-key python work is just the two int parses — the probe
    runs over the whole frontier every round."""
    mask = pd.Series(vals, dtype="object").str.fullmatch("[0-9a-f]{32}")
    if bool(mask.eq(True).all()):
        return list(vals)
    return [
        v
        if (isinstance(v, str) and _HEX_RE.match(v))
        else hashlib.md5(
            ("" if v is None else str(v)).encode("utf-8")
        ).hexdigest()
        for v in vals
    ]


def _key_words(vals) -> tuple[np.ndarray, np.ndarray]:
    """(h1, f) per key: bucket entropy from the first md5-hex half,
    fingerprint from the second (1..65535, 0 means empty slot)."""
    vals = _norm_keys(vals)
    n = len(vals)
    h1 = np.fromiter((int(v[:16], 16) for v in vals), dtype=np.uint64, count=n)
    f = np.fromiter(
        ((int(v[16:24], 16) % _FP_MASK) + 1 for v in vals),
        dtype=np.uint64,
        count=n,
    )
    return h1, f


def _hf_from_words(ha, hb) -> tuple[np.ndarray, np.ndarray]:
    """(h1, f) from JVM-precomputed u64 word columns
    (operators/bloom.py:word_exprs): h1 is the first half verbatim,
    the fingerprint comes from hex[16:24] = the HIGH 32 bits of the
    second half — bit-identical to _key_words, minus the per-key
    int(v, 16) parse."""
    from crawler_spark.operators.bloom import _u64

    hau = _u64(ha)
    hbu = _u64(hb)
    f = ((hbu >> np.uint64(32)) % _FP_MASK) + np.uint64(1)
    return hau, f


class CuckooFilter:
    """One shard: a (m × 4) uint16 table + an overflow stash."""

    def __init__(
        self,
        capacity: int,
        table: np.ndarray | None = None,
        stash: np.ndarray | None = None,
    ):
        self.capacity = max(64, int(capacity))
        if table is not None:
            self.m = len(table) // _BUCKET
            self.table = table
        else:
            # pow2 buckets (the xor partner needs it) at ~84% max load
            m = 1
            while m * _BUCKET * 0.84 < self.capacity:
                m <<= 1
            self.m = m
            self.table = np.zeros(self.m * _BUCKET, dtype=np.uint16)
        self.stash = (
            stash if stash is not None else np.empty(0, dtype=np.uint64)
        )

    # ---- bucket math (all vectorized) ----
    def _i1(self, h1: np.ndarray) -> np.ndarray:
        return (h1 & np.uint64(self.m - 1)).astype(np.int64)

    def _partner(self, i: np.ndarray, f: np.ndarray) -> np.ndarray:
        mix = (f * _MIX) & np.uint64(self.m - 1)
        return (i.astype(np.uint64) ^ mix).astype(np.int64)

    def _stash_keys(self, i1: np.ndarray, f: np.ndarray) -> np.ndarray:
        # canonical stash entry: (min bucket << 16) | fingerprint —
        # computable from either candidate bucket at lookup time
        i2 = self._partner(i1, f)
        lo = np.minimum(i1, i2).astype(np.uint64)
        return (lo << np.uint64(16)) | f

    # ---- ops ----
    def insert_many(self, values) -> None:
        vals = list(values)
        if not vals:
            return
        self._insert_hf(*_key_words(vals))

    def insert_words(self, ha, hb) -> None:
        """insert from JVM-precomputed word columns (word_exprs)."""
        if len(ha):
            self._insert_hf(*_hf_from_words(ha, hb))

    def _insert_hf(self, h1: np.ndarray, f: np.ndarray) -> None:
        vals = h1  # per-key loop bound below
        i1 = self._i1(h1)
        tab = self.table.reshape(self.m, _BUCKET)
        stash_new: list[int] = []
        rng_state = 0x9E3779B97F4A7C15  # deterministic kick choices
        for j in range(len(vals)):
            fi = np.uint16(f[j])
            b1 = int(i1[j])
            b2 = int(self._partner(i1[j : j + 1], f[j : j + 1])[0])
            placed = False
            for b in (b1, b2):
                row = tab[b]
                empty = np.flatnonzero(row == 0)
                if len(empty):
                    row[empty[0]] = fi
                    placed = True
                    break
            if placed:
                continue
            # eviction path: kick a deterministic victim slot
            b, cur = b2, fi
            for kick in range(_MAX_KICKS):
                rng_state = (
                    rng_state * 6364136223846793005 + 1442695040888963407
                ) & 0xFFFFFFFFFFFFFFFF
                slot = (rng_state >> 61) % _BUCKET
                cur, tab[b, slot] = tab[b, slot], cur
                cur = np.uint16(cur)
                b = int(
                    self._partner(
                        np.asarray([b], dtype=np.int64),
                        np.asarray([cur], dtype=np.uint64),
                    )[0]
                )
                row = tab[b]
                empty = np.flatnonzero(row == 0)
                if len(empty):
                    row[empty[0]] = cur
                    placed = True
                    break
            if not placed:
                # the displaced fingerprint goes to the stash — its
                # true i1 is unknown, but (bucket, f) identifies both
                # candidates, so store the canonical form from b
                stash_new.append(
                    int(
                        self._stash_keys(
                            np.asarray([b], dtype=np.int64),
                            np.asarray([cur], dtype=np.uint64),
                        )[0]
                    )
                )
        if stash_new:
            self.stash = np.concatenate(
                [self.stash, np.asarray(stash_new, dtype=np.uint64)]
            )

    def contains_series(self, values: pd.Series) -> pd.Series:
        """Vectorized membership: 2 bucket reads + stash isin."""
        vals = values.fillna("").tolist()
        if not vals:
            return pd.Series([], dtype=bool, index=values.index)
        hit = self._contains_hf(*_key_words(vals))
        return pd.Series(hit, index=values.index)

    def contains_words(self, ha, hb) -> np.ndarray:
        """membership from JVM-precomputed word columns (word_exprs)."""
        if not len(ha):
            return np.zeros(0, dtype=bool)
        return self._contains_hf(*_hf_from_words(ha, hb))

    def _contains_hf(self, h1: np.ndarray, f: np.ndarray) -> np.ndarray:
        i1 = self._i1(h1)
        i2 = self._partner(i1, f)
        tab = self.table.reshape(self.m, _BUCKET)
        f16 = f.astype(np.uint16)
        hit = (tab[i1] == f16[:, None]).any(axis=1) | (
            tab[i2] == f16[:, None]
        ).any(axis=1)
        if len(self.stash):
            hit |= np.isin(self._stash_keys(i1, f), self.stash)
        return hit

    def delete_many(self, values) -> None:
        """Remove ONE copy of each key's (bucket, fingerprint). Safe
        for keys actually inserted (duplicates hold one copy each);
        the engine's reload un-mark deletes exactly what it marked."""
        vals = list(values)
        if not vals:
            return
        h1, f = _key_words(vals)
        i1 = self._i1(h1)
        i2 = self._partner(i1, f)
        tab = self.table.reshape(self.m, _BUCKET)
        for j in range(len(vals)):
            fi = np.uint16(f[j])
            done = False
            for b in (int(i1[j]), int(i2[j])):
                slots = np.flatnonzero(tab[b] == fi)
                if len(slots):
                    tab[b, slots[0]] = 0
                    done = True
                    break
            if not done and len(self.stash):
                sk = self._stash_keys(i1[j : j + 1], f[j : j + 1])[0]
                idx = np.flatnonzero(self.stash == sk)
                if len(idx):
                    self.stash = np.delete(self.stash, idx[0])

    # ---- serialization: [m u64][stash_len u64][table u16*][stash u64*] ----
    def to_bytes(self) -> bytes:
        head = np.asarray([self.m, len(self.stash)], dtype=np.uint64)
        return head.tobytes() + self.table.tobytes() + self.stash.tobytes()

    @classmethod
    def from_bytes(cls, capacity: int, data: bytes) -> "CuckooFilter":
        head = np.frombuffer(data[:16], dtype=np.uint64)
        m, ns = int(head[0]), int(head[1])
        toff = 16 + m * _BUCKET * 2
        table = np.frombuffer(data[16:toff], dtype=np.uint16).copy()
        stash = np.frombuffer(
            data[toff : toff + ns * 8], dtype=np.uint64
        ).copy()
        return cls(capacity, table=table, stash=stash)


class ShardedCuckoo:
    """Drop-in alternative to ``ShardedBloom`` (same store schema,
    same build/fold/check/check_broadcast/store_bytes surface) —
    selected with ``EngineConfig.seen_filter = "cuckoo"``. Sharding,
    probe tiering (broadcast vs cogroup), and the fold cadence are the
    engine's, unchanged; only the per-shard membership structure
    differs. Fold is a true incremental insert into the existing shard
    tables (cuckoo tables mutate in place; blooms must OR fixed-width
    arrays), which is what makes the delete op expressible at all."""

    def __init__(self, n_shards: int, capacity: int, fpp: float = 0.01):
        # fpp is accepted for API parity; a 16-bit/4-slot cuckoo's
        # fpp ≈ 2·4/2^16 ≈ 1.2e-4, better than any sane bloom setting
        self.n_shards = max(1, int(n_shards))
        self.shard_capacity = max(1024, capacity // self.n_shards)
        self.fpp = fpp

    def _shard_expr(self, hash_col: str):
        from crawler_spark.operators.bloom import shard_expr

        return shard_expr(hash_col, self.n_shards)

    def build(self, hashes_df, hash_col: str = "url_hash"):
        cap = self.shard_capacity

        def mk(pdf: pd.DataFrame) -> pd.DataFrame:
            cf = CuckooFilter(cap)
            cf.insert_words(pdf["_ha"].to_numpy(), pdf["_hb"].to_numpy())
            return pd.DataFrame(
                {"shard": [int(pdf["_shard"].iloc[0])], "bits": [cf.to_bytes()]}
            )

        from crawler_spark.operators.bloom import SHARD_STORE_SCHEMA, word_exprs

        ha_e, hb_e = word_exprs(hash_col)
        return (
            hashes_df.select(
                self._shard_expr(hash_col).alias("_shard"),
                ha_e.alias("_ha"),
                hb_e.alias("_hb"),
            )
            .groupBy("_shard")
            .applyInPandas(mk, SHARD_STORE_SCHEMA)
        )

    def fold(self, old_shards_df, delta_hashes_df, hash_col: str = "url_hash"):
        if old_shards_df is None:
            return self.build(delta_hashes_df, hash_col)
        cap = self.shard_capacity

        def merge(key, shards_pdf: pd.DataFrame, keys_pdf: pd.DataFrame) -> pd.DataFrame:
            cf = (
                CuckooFilter.from_bytes(cap, bytes(shards_pdf["bits"].iloc[0]))
                if len(shards_pdf)
                else CuckooFilter(cap)
            )
            if len(keys_pdf):
                cf.insert_words(
                    keys_pdf["_ha"].to_numpy(), keys_pdf["_hb"].to_numpy()
                )
            return pd.DataFrame({"shard": [int(key[0])], "bits": [cf.to_bytes()]})

        from crawler_spark.operators.bloom import SHARD_STORE_SCHEMA, word_exprs

        ha_e, hb_e = word_exprs(hash_col)
        delta = delta_hashes_df.select(
            self._shard_expr(hash_col).alias("_shard"),
            ha_e.alias("_ha"),
            hb_e.alias("_hb"),
        )
        return (
            old_shards_df.groupBy("shard")
            .cogroup(delta.groupBy("_shard"))
            .applyInPandas(merge, SHARD_STORE_SCHEMA)
        )

    def store_bytes(self) -> int:
        return self.n_shards * (len(CuckooFilter(self.shard_capacity).to_bytes()))

    def check_broadcast(self, df, hash_col: str, shards_df):
        from pyspark.sql import functions as F
        from pyspark.sql.types import BooleanType

        sc = df.sparkSession.sparkContext
        store = {int(r["shard"]): bytes(r["bits"]) for r in shards_df.collect()}
        bc = sc.broadcast(store)
        cap, P = self.shard_capacity, self.n_shards
        state: dict = {}

        @F.pandas_udf(BooleanType())
        def probe(ha: pd.Series, hb: pd.Series) -> pd.Series:
            if "f" not in state:
                state["f"] = {
                    s: CuckooFilter.from_bytes(cap, b)
                    for s, b in bc.value.items()
                }
            filters = state["f"]
            from crawler_spark.operators.bloom import _u64

            hau = _u64(ha.to_numpy())
            hbu = hb.to_numpy()
            sh = ((hau >> np.uint64(32)) % np.uint64(P)).astype(np.int64)
            out = np.zeros(len(hau), dtype=bool)
            for s in np.unique(sh):
                cf = filters.get(int(s))
                if cf is not None:
                    m = sh == s
                    out[m] = cf.contains_words(hau[m], hbu[m])
            return pd.Series(out, index=ha.index)

        from crawler_spark.operators.bloom import word_exprs

        ha_e, hb_e = word_exprs(hash_col)
        return df.withColumn("_maybe_seen", probe(ha_e, hb_e))

    def check(self, df, hash_col: str, shards_df, replicate: int | None = None):
        from pyspark.sql import functions as F
        from pyspark.sql.types import BooleanType, StructField, StructType

        if replicate is None:
            par = df.sparkSession.sparkContext.defaultParallelism
            replicate = max(1, -(-par // self.n_shards))
        out_schema = StructType(
            list(df.schema.fields) + [StructField("_maybe_seen", BooleanType())]
        )
        cap = self.shard_capacity

        def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            left = left.copy()
            if right.empty:
                left["_maybe_seen"] = False
            else:
                cf = CuckooFilter.from_bytes(cap, bytes(right["bits"].iloc[0]))
                left["_maybe_seen"] = cf.contains_words(
                    left["_ha"].to_numpy(), left["_hb"].to_numpy()
                )
            return left.drop(columns=["_shard", "_sub", "_ha", "_hb"])

        from crawler_spark.operators.bloom import word_exprs

        ha_e, hb_e = word_exprs(hash_col)
        tagged = df.withColumn(
            "_shard", self._shard_expr(hash_col)
        ).withColumn(
            "_sub",
            F.pmod(F.xxhash64(F.col(hash_col)), F.lit(replicate)).cast("int"),
        ).withColumn("_ha", ha_e).withColumn("_hb", hb_e)
        shards_rep = shards_df.select(
            "shard",
            "bits",
            F.explode(
                F.array(*[F.lit(i) for i in range(replicate)])
            ).alias("_sub"),
        )
        return (
            tagged.groupBy("_shard", "_sub")
            .cogroup(shards_rep.groupBy("shard", "_sub"))
            .applyInPandas(fn, out_schema)
        )
