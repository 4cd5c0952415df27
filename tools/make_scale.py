"""Build a 10x scale point from a driver testdata directory.

    python tools/make_scale.py [src_sf_dir] [out_dir] [factor] [shift]

Defaults: /root/testdata/sf0.1 -> /root/repo/.scale/sf1, factor 10,
shift 10^9. When the SOURCE is itself a scaled build, pass a shift
LARGER than its max id (e.g. 10^11 for sf10 -> sf100) so replica key
blocks cannot collide with the source's own shifted blocks.

Each table is the union of `factor` shifted replicas — a deterministic,
engine-independent scale-up that PRESERVES the per-replica statistical
structure the headline queries depend on, so work and shuffle volume
should grow ~linearly with the factor:

* key columns shift by ``replica * 10^9`` (doc_id, vec_id, event_id,
  user_id, order/cust keys) — group counts grow 10x, group SIZES stay
  constant (sessionize/skew-agg scale the right way);
* ``documents.text`` gets a per-replica SEEDED permutation of the
  letter alphabet (``F.translate``; replica 0 is the identity):
  lengths/token shapes are preserved, every 5-gram shingle changes, so
  duplicate classes replicate WITHIN a replica but never across
  replicas — minhash/simhash pair counts grow exactly linearly instead
  of quadratically (a Caesar rotation would collide mod 26 at
  factor > 26);
* ``documents.source`` gets a ``-r{i}`` suffix (group-keyed splits see
  10x groups of unchanged size);
* ``embeddings.embedding`` gets a per-replica SEEDED permutation of
  its dimensions (replica 0 is the identity): norms and within-replica
  geometry are preserved exactly (a fixed index permutation is an
  isometry), cross-replica cosine decorrelates, and the
  ``vec_id % 50`` query census keeps its 2% density at every scale.
  A cyclic ROTATION is not enough: it reduces mod dims (64), so
  composed two-level builds collide — outer rotation 2 over inner 0
  equals outer 0 over inner 8 at stride 100 (200 % 64 = 8), recreating
  cross-replica duplicate embedding classes, the exact quadratic
  failure the text permutation prevents. Permutation compositions
  collide with probability ~1/64! instead, and replica() asserts
  pairwise distinctness of the variant transforms at build time.

All transformations are pure Column expressions — the build itself is
a map-only Spark job per table.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

SHIFT = 1_000_000_000  # default; overridable via argv[4]

# table -> columns shifted by replica * SHIFT
KEY_SHIFTS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    # nation/region are fixed dimensions in TPC-H; copy them unscaled
}

_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = _LOWER.upper()


def _permute_alphabet(col, r: int):
    """Per-replica seeded letter-permutation of the text. A plain
    Caesar rotation collides mod 26 — at factor > 26, replicas 26
    apart would share IDENTICAL text, creating cross-replica duplicate
    classes that grow quadratically with the factor (measured: a
    factor-100 build drove minhash's candidate pairs into driver OOM).
    A seeded permutation (26! space, replica 0 = identity) keeps
    duplicate classes strictly within-replica at any factor."""
    if r == 0:
        return col
    import random

    letters = list(_LOWER)
    random.Random(0xC0FFEE + r).shuffle(letters)
    rl = "".join(letters)
    return F.translate(col, _LOWER + _UPPER, rl + rl.upper())


def _dim_perm(v: int, dims: int) -> tuple[int, ...]:
    """The variant-``v`` dimension permutation (identity at v=0)."""
    if v == 0:
        return tuple(range(dims))
    import random

    perm = list(range(dims))
    random.Random(0xD1A5 + v).shuffle(perm)
    return tuple(perm)


def _permute_array(col, v: int, dims: int):
    """Per-variant seeded permutation of the embedding dimensions — an
    exact isometry (norms and within-replica dot products unchanged)
    that, unlike a cyclic rotation, does not reduce mod dims when
    variant indices compose across two-level builds (see module
    docstring)."""
    if v == 0:
        return col
    perm = _dim_perm(v, dims)
    return F.array(*[F.element_at(col, perm[i] + 1) for i in range(dims)])


def replica(
    df: DataFrame, table: str, r: int, dims: int | None, shift: int = SHIFT
) -> DataFrame:
    # variant index for content transforms: stride by shift/SHIFT so a
    # SECOND-level build (sf10 -> sf100, shift 10^11, stride 100) uses
    # permutation seeds and rotations DISJOINT from the first level's
    # 0..9 — otherwise outer perm_1(inner identity) equals
    # outer identity(inner perm_1) and cross-replica duplicate classes
    # reappear (the exact quadratic failure the seeded permutation
    # exists to prevent).
    v = r * max(1, shift // SHIFT)
    for k in KEY_SHIFTS.get(table, []):
        df = df.withColumn(k, F.col(k) + F.lit(r * shift))
    if table == "documents":
        df = df.withColumn("text", _permute_alphabet(F.col("text"), v)).withColumn(
            "source", F.concat(F.col("source"), F.lit(f"-r{r}"))
        )
    if table == "embeddings" and dims:
        df = df.withColumn(
            "embedding",
            _permute_array(F.col("embedding"), v, dims).cast("array<float>"),
        )
    return df


def assert_disjoint_variants(factor: int, stride: int, dims: int) -> None:
    """Build-time guard: every (outer variant, inner variant) pair in
    the replica grid must compose to a DISTINCT dimension permutation,
    or cross-replica duplicate embedding classes reappear. For a
    first-level build (stride 1) the source is pristine — the inner
    grid is just the identity; for a second-level build the source
    carries inner variants 0..factor-1 and the full grid is checked."""
    inner_variants = range(factor) if stride > 1 else (0,)
    seen: dict[tuple[int, ...], tuple[int, int]] = {}
    for outer in range(factor):
        po = _dim_perm(outer * stride, dims)
        for inner in inner_variants:
            pi = _dim_perm(inner, dims)
            composed = tuple(pi[po[i]] for i in range(dims))
            prev = seen.setdefault(composed, (outer, inner))
            if prev != (outer, inner):
                raise AssertionError(
                    f"variant collision: outer={outer} inner={inner} composes "
                    f"to the same dimension permutation as outer={prev[0]} "
                    f"inner={prev[1]} (stride {stride}, dims {dims})"
                )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    shift = int(sys.argv[4]) if len(sys.argv) > 4 else SHIFT

    from sdvg_spark.session import get_spark

    spark = get_spark(app_name="make-scale")
    os.makedirs(out, exist_ok=True)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        table = fname[: -len(".parquet")]
        df = spark.read.parquet(os.path.join(src, fname))
        dims = None
        if table == "embeddings":
            dims = df.select(F.max(F.size("embedding"))).first()[0]
            assert_disjoint_variants(factor, max(1, shift // SHIFT), dims)
        if table in ("nation", "region"):
            big = df
        else:
            parts = [replica(df, table, r, dims, shift) for r in range(factor)]
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
        n = big.count()
        target = os.path.join(out, fname)
        # one file per ~64MB-ish of rows keeps the layout realistic
        big.repartition(max(1, n // 500_000 + 1)).write.mode("overwrite").parquet(
            target
        )
        print(f"{table}: {n} rows -> {target}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
