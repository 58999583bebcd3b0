"""Deduplication operators for large-scale corpus curation.

Beyond-reference components (task spec): exact, MinHash+LSH, SimHash and
n-gram-Jaccard dedup over a `documents(doc_id, text, ...)` table. All
stages are JVM-side Column expressions (no Python UDFs): shingling uses
split/transform, hashing uses md5 → hex→int (deterministic and
reproducible in DuckDB for the oracle), banding uses explode + hash-groupBy.

Scale design (100 TB corpora):
- exact: one shuffle on a 64-bit content hash (no text comparison).
- MinHash LSH: signatures are computed scan-local (narrow); only
  (band_id, band_hash, doc_id) tuples shuffle — b×n rows of ~24 bytes —
  then candidate pairs join within buckets. Bucket skew (giant near-dup
  clusters) is handled by AQE skew-join; verification re-computes exact
  Jaccard only on candidates.
- SimHash: 32-bit signature scan-local; candidates via banding the
  signature (two 16-bit halves — Hamming≤k pigeonhole), verified by
  popcount of XOR.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def hash64(col) -> Column:
    """Deterministic 60-bit int hash from md5 (reproducible in DuckDB as
    ('0x' || substr(md5(x),1,15))::BIGINT — verified identical)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("long")


def tokens(col) -> Column:
    """Whitespace tokens of lowercased text."""
    return F.split(F.lower(F.trim(_c(col))), r"\s+")


def _shingle_zip(col, k: int):
    """k aligned bulk slices of the token array zipped into one array of
    k-field structs — one struct per shingle position. Replaces the old
    per-position `transform(sequence(...), i -> array_join(slice(toks,i,k)))`
    formulation: the HOF lambda is interpreted per element, and slice +
    array_join allocated a fresh array and string per shingle (guide §1.2
    per-task work). The zip does k bulk copies once, so the only per-element
    lambda left is a concat_ws over struct fields — measured 2.48s → 0.89s
    for the sf1 shingle phase, byte-identical sets. Bonus: documents with
    <k tokens now yield [] exactly like the oracle's generate_series(1, 0)
    — the sequence() formulation built a descending [1, 0] index and
    CRASHED on slice(toks, 0, k)."""
    toks = tokens(col)
    m = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    return F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(k)])


def _shingle_text(k: int):
    """Lambda body: space-joined shingle string from a zip struct."""
    return lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(k)])


def shingles(col, k: int = 3) -> Column:
    """Distinct word k-shingles as space-joined strings — JVM-side."""
    return F.array_distinct(F.transform(_shingle_zip(col, k), _shingle_text(k)))


def hashed_shingles(col, k: int = 3) -> Column:
    """Distinct word k-shingles as 64-bit xxhash64 longs. Set operations
    (intersection size, Jaccard) over hashed shingles are identical to the
    string formulation modulo 2^-64 collisions, and shuffling 8-byte longs
    instead of raw shingle strings cuts verify-stage shuffle ~10× — at
    corpus scale the string formulation re-materializes the corpus as
    arrays on both sides of every candidate pair. Distinct applies at the
    hash level (one fused lambda): equal strings hash equal, and a 64-bit
    collision only merges two shingles — Jaccard shifts ~n²/2^64 per doc."""
    text = _shingle_text(k)
    return F.array_distinct(
        F.transform(_shingle_zip(col, k), lambda s: F.xxhash64(text(s)))
    )


def shingle_hashes60(col, k: int = 3) -> Column:
    """Distinct word k-shingles as 60-bit md5-derived longs — the ONE hash
    pass the MinHash pipeline needs. The value is the first 15 hex chars of
    md5(shingle); its top 32 bits (h >> 28) equal the first-8-hex-chars
    value the DuckDB oracle computes for signature bases, so one md5 per
    shingle serves BOTH signature generation and Jaccard verification
    (previously two full tokenize+shingle+hash scans — measured 9.5s → 5.7s
    for the sf1 pipeline). Distinct at the 60-bit level instead of the
    string level: a 60-bit collision merges two shingles whose 32-bit
    prefixes are then also equal, so permutation minima are unchanged and
    Jaccard shifts only at ~n²/2^60 per doc — immaterial."""
    text = _shingle_text(k)
    return F.array_distinct(
        F.transform(
            _shingle_zip(col, k),
            lambda s: F.conv(F.substring(F.md5(text(s)), 1, 15), 16, 10).cast("long"),
        )
    )


def shingle_hash_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(__sid, __sh) with distinct 60-bit shingle hashes per doc, eagerly
    materialized (localCheckpoint) because every consumer — signature
    explode, both verify-join sides — would otherwise re-run the md5 scan.
    The checkpoint holds only (id, array<long>) — set-cardinality-sized at
    any corpus scale, never the text."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par // 2:
        # Spread the md5 pipeline when the source is under-partitioned (a
        # single small parquet file = ONE scan partition on one core).
        df = df.repartition(par)
    return df.select(
        F.col(id_col).alias("__sid"),
        shingle_hashes60(F.col(text_col), k).alias("__sh"),
    ).localCheckpoint(eager=True)


# ---------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest id.

    Only (hash, id) shuffles; ties on hash (collisions) are fine for
    keep-one semantics since we group by full text equality via both
    hash AND text (hash prunes the comparison)."""
    return (
        df.withColumn("__h", hash64(text_col))
        .groupBy("__h", text_col)
        .agg(F.min(id_col).alias(id_col))
        .drop("__h")
        .select(id_col, text_col)
    )


# ---------------------------------------------------------------- minhash


_MINHASH_P = 4294967311  # prime > 2^32


def minhash_base_hashes(col, k: int = 3) -> Column:
    """Per-shingle 32-bit base hashes (ONE md5 per shingle). Materialize
    this column (checkpoint/persist) before fanning out the permutations:
    Catalyst inlines lambda subexpressions, so feeding this expression
    directly into N permutation lambdas recomputes the md5 pass N times
    (measured 37s → 4s for signatures over 50k docs at sf1)."""
    return F.transform(
        shingles(col, k),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )


def minhash_sig_from_base(base, num_hashes: int = 16) -> Column:
    """Affine-permutation minima over a (materialized) base-hash array:
    h_i = (a_i·h + b_i) mod p (Broder '97 family). Deterministic constants
    so the DuckDB oracle reproduces signatures bit-for-bit; products stay
    < 2^38 — no bigint overflow in either engine."""
    base = _c(base)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(base, lambda h: (h * (2 * i + 1) + i * 12345 + 1) % _MINHASH_P)
        ),
    )


def minhash_signature(col, num_hashes: int = 16, k: int = 3) -> Column:
    """MinHash signature as a single Column expression (composition of
    minhash_base_hashes + minhash_sig_from_base). Fine for small inputs /
    API parity; pipelines should materialize the base hashes between the
    two steps — see minhash_lsh_candidates."""
    return minhash_sig_from_base(minhash_base_hashes(col, k), num_hashes)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    shingle_sets: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) via LSH banding: docs sharing any
    band of the signature. Output: (id_a, id_b) distinct."""
    rows_per_band = num_hashes // bands
    # ONE hash pass (shingle_hash_sets): signature bases are the top 32
    # bits of the 60-bit shingle hashes, so no second md5 scan. Callers
    # that also verify (minhash_dedup, the bench query) pass their
    # already-materialized shingle_sets in and the text is scanned once
    # for the whole pipeline.
    if shingle_sets is None:
        shingle_sets = shingle_hash_sets(df, id_col, text_col, k)
    # Signature computation stays OUT of array-lambda land: explode the
    # per-shingle hashes and compute the num_hashes permutation minima as
    # codegen'd MIN aggregates with map-side combine (one shuffle of
    # partial minima). The HOF formulation (minhash_sig_from_base)
    # evaluates interpreted per-element lambdas with boxing — measured
    # 20s vs 9s at sf1 for 50k docs.
    # (Docs with <k tokens have no shingles and drop out here; their
    # candidate pairs would be discarded anyway — Jaccard 0/0 is NULL in
    # both engines.)
    exploded = shingle_sets.select(
        F.col("__sid").alias("__id"), F.explode("__sh").alias("__h60")
    )
    h = F.shiftrightunsigned(F.col("__h60"), 28)
    sig = exploded.groupBy("__id").agg(
        *[
            F.min((h * (2 * i + 1) + i * 12345 + 1) % _MINHASH_P).alias(f"__m{i}")
            for i in range(num_hashes)
        ]
    ).select(
        "__id", F.array(*[f"__m{i}" for i in range(num_hashes)]).alias("__sig")
    )
    # Materialize once (eager): the band self-join's two branches otherwise
    # EACH recompute the pipeline, and with a lazy checkpoint they race
    # inside one job and still recompute (measured 104s → 2s at sf0.1).
    # Signatures are tiny (num_hashes longs/doc) at any corpus size.
    sig = sig.localCheckpoint(eager=True)
    banded = sig.select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.array_join(
                        F.transform(
                            F.sequence(b * rows_per_band + 1, (b + 1) * rows_per_band),
                            lambda i: F.element_at(F.col("__sig"), i.cast("int")).cast("string"),
                        ),
                        ",",
                    ).alias("key"),
                ),
            )
        ).alias("__band"),
    ).select("__id", F.col("__band.band").alias("__b"), F.col("__band.key").alias("__k"))
    a = banded.select(F.col("__b"), F.col("__k"), F.col("__id").alias("id_a"))
    b = banded.select(F.col("__b"), F.col("__k"), F.col("__id").alias("id_b"))
    return (
        a.join(b, ["__b", "__k"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Keep-set after MinHash LSH dedup: drop any doc that has a verified
    near-dup (shingle Jaccard ≥ threshold) with a smaller doc_id.

    (Single-link transitive clustering would need an iterative
    connected-components pass — `recursive_cte` covers that; the
    keep-smallest-neighbor rule is the standard one-pass policy.)"""
    # One text scan for the whole pipeline: the 60-bit shingle sets feed
    # candidate generation (top-32-bit signature bases) AND verification.
    sh = shingle_hash_sets(df, id_col, text_col, k)
    cands = minhash_lsh_candidates(
        df, id_col, text_col, num_hashes, bands, k, shingle_sets=sh
    )
    # Re-spread the candidate pairs before the heavy array_intersect stage:
    # AQE coalesces the small (id_a, id_b) shuffle to a few partitions by
    # byte size, but per-row cost here is set-intersection work, not bytes
    # (measured 2.1s on 3 tasks → 0.5s on 32 at sf1).
    par = df.sparkSession.sparkContext.defaultParallelism
    cands = cands.repartition(par, "id_a")
    # Size prefilter (jac >= t ⇒ min(n)/max(n) >= t) + explode(array(·))
    # barrier so array_intersect evaluates once instead of being folded
    # 3× into the join condition — see queries/dedup.py dedup_minhash_lsh.
    verified = (
        cands.join(sh.withColumnRenamed("__sid", "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("__sid", "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
        .withColumn("__na", F.size("sh_a"))
        .withColumn("__nb", F.size("sh_b"))
        .filter(F.least("__na", "__nb") >= jaccard_threshold * F.greatest("__na", "__nb"))
        .select(
            "id_a", "id_b", "__na", "__nb",
            F.explode(F.array(F.size(F.array_intersect("sh_a", "sh_b")))).alias("__inter"),
        )
        .withColumn(
            "__jac",
            F.col("__inter") / (F.col("__na") + F.col("__nb") - F.col("__inter")),
        )
        .filter(F.col("__jac") >= jaccard_threshold)
    )
    dupes = verified.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dupes, id_col, "left_anti")


# ---------------------------------------------------------------- simhash


def simhash(col, bits: int = 32) -> Column:
    """SimHash signature over whitespace tokens: bit j of the signature is
    the sign of Σ_tokens (±1 per token's hash bit j). JVM-side."""
    toks = F.array_distinct(tokens(col))
    hashes = F.transform(toks, lambda t: hash64(t))
    # Python-level loop over bit positions (shift amounts must be literals);
    # yields one balanced expression tree, still a single JVM projection.
    def bit_vote(j: int):
        # closure factory: the lambda must be exactly 2-ary for F.aggregate
        return lambda s, h: s + F.when(
            F.shiftright(h, j).bitwiseAND(1) == 1, 1
        ).otherwise(-1)

    sig = F.lit(0).cast("long")
    for j in range(bits):
        bit_sum = F.aggregate(hashes, F.lit(0).cast("long"), bit_vote(j))
        sig = sig + F.when(bit_sum > 0, F.lit(1 << j).cast("long")).otherwise(0)
    return sig


def simhash_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 32-bit signature into 4 bytes
    (pigeonhole: hamming ≤ 3 ⇒ at least one byte equal), join per band,
    verify with popcount(xor) ≤ max_hamming."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par // 2:
        df = df.repartition(par)  # see minhash_lsh_candidates: gated spread
    sig = df.select(F.col(id_col).alias("__id"), simhash(F.col(text_col)).alias("__sig"))
    sig = sig.localCheckpoint(eager=True)  # reused by both self-join sides
    banded = sig.select(
        "__id",
        "__sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("__sig"), b * 8).bitwiseAND(255).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("__band"),
    ).select("__id", "__sig", F.col("__band.band").alias("__b"), F.col("__band.key").alias("__k"))
    a = banded.select("__b", "__k", F.col("__id").alias("id_a"), F.col("__sig").alias("sig_a"))
    b = banded.select("__b", "__k", F.col("__id").alias("id_b"), F.col("__sig").alias("sig_b"))
    return (
        a.join(b, ["__b", "__k"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------- jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold via inverted index:
    explode shingles → self-join on shingle (the only shuffle — one row
    per (shingle, doc)) → count intersections → closed-form Jaccard.

    max_doc_freq enables document-frequency pruning of hot shingles (the
    standard bound on inverted-index fan-out: a shingle in d docs produces
    d² candidate rows, so one stop-word shingle at 100 TB is quadratic).
    Dropping shingles with df > max_doc_freq makes the measured Jaccard a
    lower bound over the REMAINING shingles — exact for pairs whose overlap
    isn't dominated by corpus-hot shingles, and candidates lost this way
    share only near-universal (non-discriminative) content. Default None =
    exact (bench/oracle mode)."""
    # Inverted index over hashed shingles: the per-(shingle, doc) shuffle
    # rows carry an 8-byte long instead of the shingle text.
    sh = df.select(
        F.col(id_col).alias("__id"), hashed_shingles(F.col(text_col), k).alias("__sh")
    )
    sizes = sh.select("__id", F.size("__sh").alias("__n"))
    inv = sh.select("__id", F.explode("__sh").alias("__s"))
    if max_doc_freq is not None:
        hot = (
            inv.groupBy("__s")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_doc_freq)
            .select("__s")
        )
        inv = inv.join(F.broadcast(hot), "__s", "left_anti")
    pairs = (
        inv.alias("x")
        .join(inv.alias("y"), "__s")
        .filter(F.col("x.__id") < F.col("y.__id"))
        .groupBy(F.col("x.__id").alias("id_a"), F.col("y.__id").alias("id_b"))
        .agg(F.count("*").alias("__inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__n", "na"), "id_a")
        .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__n", "nb"), "id_b")
        .withColumn("jaccard", F.col("__inter") / (F.col("na") + F.col("nb") - F.col("__inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


# ------------------------------------------------------- embedding cosine


_NEARDUP_CROSSJOIN_LIMIT = 100_000


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_col: str | None = None,
    allow_crossjoin: bool = False,
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold. Exact all-pairs within
    optional blocking key (at scale pass an LSH bucket as block_col — see
    similarity.lsh_buckets).

    Without a block the plan is an O(n²) crossJoin; blockless input above
    _NEARDUP_CROSSJOIN_LIMIT rows is therefore AUTO-ROUTED through
    similarity.lsh_buckets (sign-LSH blocking): the plan becomes a banded
    equi-join and pairs are bucket-local — the standard LSH recall
    trade-off, instead of a refusal (small inputs keep exact all-pairs).
    Pass allow_crossjoin=True to force the exact quadratic plan anyway."""
    if block_col is None and not allow_crossjoin:
        # Bounded scan: we only need to know whether the input EXCEEDS the
        # limit, not its exact size — a full count() of a 100 TB corpus just
        # to decide the routing would itself be the bug.
        n = df.limit(_NEARDUP_CROSSJOIN_LIMIT + 1).count()
        if n > _NEARDUP_CROSSJOIN_LIMIT:
            from duckdb_spark.operators import similarity as S

            dim = df.select(
                F.size(F.col(vec_col).cast("array<double>")).alias("d")
            ).first()["d"]
            blocked = S.lsh_buckets(
                df.select(id_col, vec_col), vec_col, int(dim), num_planes=8
            )
            return embedding_neardup_pairs(
                blocked, id_col, vec_col, threshold, block_col="bucket"
            )
    v = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        *( [F.col(block_col).alias("__blk")] if block_col else [] ),
    )
    a, b = v.alias("a"), v.alias("b")
    cond = F.col("a.__id") < F.col("b.__id")
    joined = a.join(b, (F.col("a.__blk") == F.col("b.__blk")) & cond) if block_col else a.crossJoin(b).filter(cond)
    dot = F.aggregate(
        F.zip_with(F.col("a.__v"), F.col("b.__v"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))  # noqa: E731
    return (
        joined.withColumn("cosine", dot / (norm(F.col("a.__v")) * norm(F.col("b.__v"))))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"),
            F.round("cosine", 4).alias("cosine"),
        )
    )
