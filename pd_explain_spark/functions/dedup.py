"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Training-data pipeline extensions (no reference counterpart). Scale notes:

 * exact_duplicates: hash-groupBy — one shuffle on a 32-char key; at
   100 TB combine-side partial aggregation makes this shuffle tiny.
 * ngram-Jaccard: exact pairwise similarity via shingle inverted index
   (explode -> self-join on shingle -> per-pair intersection counts).
   Exact but O(pairs sharing a shingle) — the correctness baseline.
 * MinHash+LSH: the scale path — per-doc signature of K minhashes
   (xxhash64 seeded per row of the signature), banded into B buckets;
   only docs sharing a band-bucket are pair-joined, then verified with
   the exact Jaccard. Collision probability follows the standard
   (1 - (1 - s^r)^b) S-curve.
 * SimHash: 64-bit signature from token-hash bit-vote; Hamming-close
   pairs via bucketed prefix blocks.

All shingling is built on pyspark.sql.functions (transform/sequence/
xxhash64) — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import normalized_text


# ---------------------------------------------------------------- exact
def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (normalized) texts: (text_hash, dup_count, keep_id)."""
    h = F.md5(normalized_text(F.col(text_col)))
    return (
        df.select(h.alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min(id_col).alias("keep_id"))
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (min id) per normalized text."""
    w = Window.partitionBy(F.md5(normalized_text(F.col(text_col)))).orderBy(F.col(id_col))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


# ---------------------------------------------------------------- shingles
def shingles(text_col, n: int = 3):
    """Word n-gram shingles of the normalized text (distinct set semantics)."""
    toks = F.split(normalized_text(text_col), " ")
    k = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - F.lit(1), F.lit(-1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(F.when(k > 0, grams).otherwise(F.array()))


def _doc_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh")
    ).filter(F.size("sh") > 0)


# ---------------------------------------------------------------- exact jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >= 1 shingle.

    Inverted-index join: |A ∩ B| counted per pair from the exploded
    shingle table; |A ∪ B| = |A| + |B| - |A ∩ B|. Returns
    (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    """
    docs = _doc_shingles(df, text_col, id_col, n)
    sizes = docs.select("id", F.size("sh").alias("n_sh"))
    inv = docs.select("id", F.explode("sh").alias("shingle"))
    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


# ---------------------------------------------------------------- minhash + lsh
def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, num_hashes: int = 64,
) -> DataFrame:
    """(id, sig: array<bigint>) — sig[i] = min over shingles of xxhash64(shingle, i)."""
    docs = _doc_shingles(df, text_col, id_col, n)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(F.col("sh"), lambda s: F.xxhash64(s, i))
        ),
    )
    return docs.select("id", sig.alias("sig"))


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Band the signature; docs sharing any (band, bucket) are candidates."""
    banded = signatures.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, num_hashes: int = 64, bands: int = 16, threshold: float = 0.5,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard — the 100 TB dedup path:
    candidate generation never compares all pairs, verification touches
    only bucket-colliding pairs."""
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes)
    cands = minhash_lsh_candidates(sigs, bands, num_hashes // bands)
    docs = _doc_shingles(df, text_col, id_col, n)
    da = docs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    db = docs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------- simhash
def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash from token hashes, fully JVM-side:
    bit b of the signature = sign of sum over tokens of (+1 if bit set else -1)."""
    toks = F.array_distinct(F.split(normalized_text(F.col(text_col)), " "))
    with_hashes = df.select(
        F.col(id_col).alias("id"), F.transform(toks, lambda t: F.xxhash64(t)).alias("hs")
    )
    def bit_vote(mask):
        def merge(acc, h):
            return acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1)

        return F.aggregate(F.col("hs"), F.lit(0), merge)

    sig = F.lit(0).cast("long")
    for b in range(64):
        mask = F.expr(f"shiftleft(1L, {b})")
        sig = sig.bitwiseOR(F.when(bit_vote(mask) > 0, mask).otherwise(F.lit(0).cast("long")))
    return with_hashes.select("id", sig.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Hamming-close pairs via 4x16-bit block LSH (a pair within distance
    <= 3 must agree on at least one of 4 blocks), verified exactly."""
    sigs = simhash_signatures(df, text_col, id_col)
    block_structs = [
        F.struct(
            F.lit(i).alias("block"),
            F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
        )
        for i in range(4)
    ]
    blocks = sigs.select(
        "id", "simhash", F.explode(F.array(*block_structs)).alias("bk")
    ).select("id", "simhash", F.col("bk.block").alias("block"), F.col("bk.key").alias("key"))
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs
