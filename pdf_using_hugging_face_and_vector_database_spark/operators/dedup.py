"""Deduplication operator family (BASELINE.json north star: the
LLM-training-data-pipeline ops the reference's corpus ingest implies).

All variants are built from relational primitives + the deterministic
md5 hashing in functions/hashing.py, so each is oracle-checkable and
shuffle-efficient:

- exact:     one groupBy on a 256-bit content hash (map-side partial
             agg; the only shuffle is on the hash key, which is
             uniformly distributed — no skew by construction).
- MinHash:   shingle -> signature -> band -> bucket self-join. The
             self-join is on (band_index, band_hash) — candidate pairs
             only, never the O(n^2) cross product.
- SimHash:   16/32-bit sign fingerprint; near-dups = equal fingerprint
             (or small Hamming distance at the call site).
- n-gram Jaccard: verification metric on candidate pairs.
- embedding: cosine >= threshold within a blocking key (exact variant;
             the unblocked scale path is LSH, operators/ann.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    element_hashes,
    md5_int,
    minhash_from_hashes,
    simhash_from_hashes,
)
from ..functions.text import char_ngrams, tokens


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup by content hash: one survivor (min id) per distinct
    text; ``dup_count`` reports group size. Equivalent to the
    reference's upsert-by-id last-writer-wins collapse
    (`streamlit_app.py:102,110`) but keyed on content, not position.
    """
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_hash"))
        .agg(
            F.min(id_col).alias("kept_" + id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 16,
    ngram: int = 4,
    out_col: str = "minhash",
) -> DataFrame:
    """Append a MinHash signature (array<long>) over character
    ``ngram``-shingles of the text.

    Two-step: the per-shingle md5 hashes land in a temp column first so
    each shingle is hashed ONCE; the k permutations are then integer
    arithmetic over that array (the md5 dominates cost at scale)."""
    tmp = f"__{out_col}_hs"
    return (
        df.withColumn(tmp, element_hashes(char_ngrams(F.col(text_col), ngram)))
        .withColumn(out_col, minhash_from_hashes(F.col(tmp), num_hashes))
        .drop(tmp)
    )


def minhash_signatures_agg(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    ngram: int = 4,
    out_col: str = "minhash",
    hash_fn: str = "md5",
    shingle: str = "char",
) -> DataFrame:
    """MinHash signatures in the scale shape: explode shingle hashes ->
    ONE groupBy(id) with ``num_hashes`` min aggregates -> array.
    ``shingle='word'`` uses word n-grams (~4x fewer shingle rows on
    prose — the corpus-dedup default at scale).

    Fully whole-stage-codegen'd with map-side partial mins (the
    array-fold form in with_minhash is CodegenFallback: ~20x more CPU
    at 500k docs). Identical integer results — the DuckDB oracle
    doesn't know the difference. Returns (id_col, out_col) only.
    """
    from ..functions.hashing import P_MINHASH, minhash_params

    # Build shingles WITHOUT array higher-order functions: explode a
    # position sequence and project substring/concat_ws — plain
    # codegen'd expressions. (The transform(sequence(...)) array form
    # is CodegenFallback: measured 160-190s just to BUILD the shingle
    # arrays for 500k docs; this shape removes that entirely.)
    text = F.col(text_col)
    if shingle == "char":
        n_pos = F.greatest(F.length(text) - F.lit(ngram - 1), F.lit(1))
        base = df.select(
            id_col, text, F.explode(F.sequence(F.lit(1), n_pos)).alias("pos")
        )
        shingle_col = F.substring(text, F.col("pos"), F.lit(ngram))
    elif shingle == "word":
        toked = df.select(id_col, tokens(text).alias("__t"))
        n_pos = F.greatest(F.size("__t") - F.lit(ngram - 1), F.lit(1))
        base = toked.select(
            id_col, "__t", F.explode(F.sequence(F.lit(1), n_pos)).alias("pos")
        )
        # F.get is 0-indexed and null-safe OOB; concat_ws skips nulls,
        # matching array_join(slice(...)) on short token lists
        shingle_col = F.concat_ws(
            " ", *[F.get("__t", F.col("pos") - 1 + F.lit(j)) for j in range(ngram)]
        )
    else:
        raise ValueError(f"unknown shingle mode: {shingle}")

    if hash_fn == "md5":
        h = md5_int(shingle_col)
    elif hash_fn == "xxhash64":
        # low-24-bit mask, same fold as functions.hashing.element_hashes
        # (r14: bitmask, not abs+mod — see the docstring there)
        h = F.xxhash64(shingle_col).bitwiseAND(F.lit(0xFFFFFF))
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn}")

    hashed = base.select(id_col, h.alias("h"))
    params = minhash_params(num_hashes)
    mins = hashed.groupBy(id_col).agg(
        *[
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(P_MINHASH)).alias(f"__m{k}")
            for k, (a, b) in enumerate(params)
        ]
    )
    return mins.select(
        id_col, F.array(*[F.col(f"__m{k}") for k in range(num_hashes)]).alias(out_col)
    )


def _dedup_code_token() -> str:
    """Code token over EVERY module in the signature/groups derivation
    chain — this module plus the hashing and tokenization functions
    (r8 review fix: a token covering only dedup.py let an edit to
    functions/hashing.py or functions/text.py serve stale stores,
    surfacing as a confusing oracle mismatch on the consumer — the
    exact failure class the token exists to prevent)."""
    import sys

    from ..functions import hashing as _hashing
    from ..functions import text as _text
    from ..store import code_token

    return code_token(sys.modules[__name__], _hashing, _text)


def persisted_signatures(
    spark,
    sf_dir: str,
    corpus: DataFrame,
    num_hashes: int,
    ngram: int,
    shingle: str,
    tag: str,
    corpus_salt: str = "",
) -> DataFrame:
    """Fingerprint-keyed persisted MinHash signature table — the same
    build/probe split as the IVF index (operators/ann.py): the
    signature table IS the dedup index, and at 100 TB you build it
    once per corpus version, not once per query. A stale store (the
    source parquet changed, or the derivation constants in the salt
    changed) is detected via the fingerprint and rebuilt; the marker
    is written LAST (crash-safe ordering, same as build_ivf_index).

    Signatures are a pure function of the corpus, so cached-vs-fresh
    is bit-identical — oracle rows cannot tell the difference. The
    salt folds in a code token of this module + the hashing functions
    (store.code_token): a kernel change invalidates stored signatures
    instead of silently serving the old derivation.
    """
    from .. import store as _store
    from ..io import table_path
    from .ann import dataset_dir_key, dataset_fingerprint

    # ``tag`` names the CORPUS DERIVATION (e.g. 'char7' = the synthetic
    # neardup union, 'char7base' = plain documents), not just a label —
    # it is part of both the store path AND the fingerprint salt, so
    # two derivations with identical hashing constants can never serve
    # each other's signatures. ``corpus_salt`` carries the derivation's
    # CONSTANTS + builder code token from the caller (r9 review fix:
    # the tag alone is an unenforced naming convention — a change to
    # the corpus builder's truncation constant or structure must
    # rotate the fingerprint, not keep serving signatures of a corpus
    # that no longer exists in that form).
    salt = (
        f"mh:{num_hashes}:{ngram}:{shingle}:{tag}:{corpus_salt}:"
        f"{_dedup_code_token()}"
    )
    fp = dataset_fingerprint(table_path(sf_dir, "documents"), salt=salt)
    return _store.persisted_result(
        spark,
        f"minhash_{dataset_dir_key(sf_dir)}_{tag}",
        fp,
        lambda: minhash_signatures_agg(
            corpus, num_hashes=num_hashes, ngram=ngram, shingle=shingle
        ),
    )


def persisted_simhash(
    spark,
    sf_dir: str,
    corpus: DataFrame,
    bits: int,
    tag: str,
    corpus_salt: str = "",
) -> DataFrame:
    """Fingerprint-keyed persisted SimHash fingerprint table — the
    persisted_signatures contract for the third dedup modality (r9):
    fingerprints are a pure function of (corpus, bits, kernel), built
    once per corpus version. Without the store the banded-Hamming
    self-join recomputed the whole explode+agg lineage ONCE PER JOIN
    SIDE every query (measured 2×1.5 s of the 2.7 s neardup_simhash at
    sf0.1). Same tag-names-the-derivation rule as the MinHash store:
    'sim48' = the synthetic neardup union."""
    from .. import store as _store
    from ..io import table_path
    from .ann import dataset_dir_key, dataset_fingerprint

    salt = f"sh:{bits}:{tag}:{corpus_salt}:{_dedup_code_token()}"
    fp = dataset_fingerprint(table_path(sf_dir, "documents"), salt=salt)
    return _store.persisted_result(
        spark,
        f"simhash_{dataset_dir_key(sf_dir)}_{tag}",
        fp,
        lambda: simhash_agg(corpus, bits=bits),
    )


def persisted_groups(
    spark,
    sf_dir: str,
    sigs: DataFrame,
    nodes: DataFrame,
    num_hashes: int,
    bands: int,
    tag: str,
    corpus_salt: str = "",
) -> DataFrame:
    """Fingerprint-keyed persisted near-dup GROUPS table — the dedup
    analogue of the IVF build/probe split: ``neardup_groups`` is the
    build job (pays the connected-components run); consumers like the
    dedup_pipeline capstone read the persisted mapping. Groups are a
    pure function of the corpus + constants (fixpoint, deterministic),
    so cached-vs-fresh is bit-identical; staleness keys on the source
    fingerprint + constants salt + a code token of every kernel module
    in the derivation (kernel changes rebuild, never serve stale
    groups), marker written last (crash-safe) — all through
    store.persisted_result."""
    from .. import store as _store
    from ..io import table_path
    from .ann import dataset_dir_key, dataset_fingerprint

    salt = f"cc:{num_hashes}:{bands}:{tag}:{corpus_salt}:{_dedup_code_token()}"
    fp = dataset_fingerprint(table_path(sf_dir, "documents"), salt=salt)
    return _store.persisted_result(
        spark,
        f"neardup_groups_{dataset_dir_key(sf_dir)}_{tag}",
        fp,
        lambda: neardup_representatives(
            sigs, num_hashes=num_hashes, bands=bands, nodes=nodes
        ),
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` rows, self-join
    on (band_index, band signature) to get candidate pairs (a < b),
    then report the MinHash Jaccard estimate (= fraction of equal
    signature components — exact integer arithmetic, so the DuckDB
    oracle matches bit-for-bit).

    Scale shape: explode(bands) -> shuffle on band hash -> join. Bucket
    sizes are data-dependent; AQE skew-join splits hot buckets.
    """
    from ..caching import persist_tracked

    # persist: the self-join would otherwise recompute the signature
    # derivation (shingling + hashing) for BOTH sides of the join — at
    # scale you persist the signature table anyway (it is the index).
    # Tracked so caching.release_caches() reclaims it between queries.
    df = persist_tracked(df)
    banded = banded_signatures(
        df, id_col, sig_col, num_hashes, bands, id_col, sig_col
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_index") == F.col("r.band_index"))
            & (F.col("l.band_sig") == F.col("r.band_sig"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col(f"l.{sig_col}").alias("sig_a"),
            F.col(f"r.{sig_col}").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = minhash_jaccard_est(F.col("sig_a"), F.col("sig_b"), num_hashes)
    return pairs.select("id_a", "id_b", est.alias("jaccard_est"))


def banded_signatures(
    df: DataFrame,
    id_col: str,
    sig_col: str,
    num_hashes: int,
    bands: int,
    out_id: str,
    out_sig: str,
) -> DataFrame:
    """Shared LSH banding projection: one row per (doc, band) with the
    band's signature slice. Single source of truth for the band-slice
    arithmetic — minhash_candidate_pairs, incremental_candidate_pairs,
    and the streaming incremental dedup all band through here, so the
    batch and stream paths cannot drift apart."""
    if num_hashes % bands:
        # a non-divisible split would silently band only the first
        # bands*(num_hashes//bands) components and weaken recall
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    rows_per_band = num_hashes // bands
    # bind to the INPUT dataframe's columns (df[...]), not name lookup:
    # when out_sig == sig_col the name would resolve laterally against
    # the alias in the same select (Spark internal error)
    sig = df[sig_col]
    return df.select(
        df[id_col].alias(out_id),
        sig.alias(out_sig),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.slice(
                    sig, b * F.lit(rows_per_band) + F.lit(1), rows_per_band
                ),
            )
        ).alias("band_index", "band_sig"),
    )


def minhash_jaccard_est(sig_a, sig_b, num_hashes: int) -> Column:
    """MinHash Jaccard estimate = fraction of equal signature
    components (exact integer comparison, so cross-engine oracles
    match bit-for-bit)."""
    return F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda eq: eq)
    ).cast("double") / F.lit(float(num_hashes))


def derive_incremental_batch(docs: DataFrame, trunc: int = 10) -> DataFrame:
    """Shared incremental-dedup batch fixture: docs ≡0 (mod 5)
    re-enter truncated by ``trunc`` chars under id+300000 (true
    near-dups of their corpus source) and docs ≡1 (mod 5) re-enter
    reversed under id+400000 (novel content — negative path). Works on
    batch AND streaming DataFrames (pure row-local projections); the
    batch query, the stream-static query, and the DuckDB oracle all
    derive the same batch through these constants."""
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + F.lit(300000)).alias("doc_id"),
        F.substring(
            F.col("text"), 1, F.length("text") - F.lit(trunc)
        ).alias("text"),
    )
    novel = docs.filter(F.col("doc_id") % 5 == 1).select(
        (F.col("doc_id") + F.lit(400000)).alias("doc_id"),
        F.reverse(F.col("text")).alias("text"),
    )
    return near.unionByName(novel)


def incremental_candidate_pairs(
    corpus_sigs: DataFrame,
    batch_sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    num_hashes: int = 16,
    bands: int = 4,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Incremental (batch-vs-corpus) LSH candidate pairs — the dedup
    shape a production ingest actually runs daily: the corpus signature
    table is the persisted index (built once per corpus version, see
    persisted_signatures), and each new batch is banded and joined
    AGAINST it, never against itself unioned into the corpus.

    Returns (batch_id, corpus_id, jaccard_est) — one row per
    (batch doc, corpus doc) bucket collision, deduped across bands.

    Scale shape: the corpus side is a parquet scan of the signature
    store exploded to ``bands`` rows per doc — it never re-shingles
    text and never self-joins. The batch side (a daily increment,
    orders of magnitude smaller than the corpus) is broadcast, so the
    100 TB corpus side is a map-side hash probe with NO shuffle of the
    corpus at all. At extreme batch sizes set broadcast_batch=False to
    fall back to a shuffle hash join on (band_index, band_sig).
    """
    c = banded_signatures(
        corpus_sigs, id_col, sig_col, num_hashes, bands, "corpus_id", "__sig_c"
    )
    b = banded_signatures(
        batch_sigs, id_col, sig_col, num_hashes, bands, "batch_id", "__sig_b"
    )
    if broadcast_batch:
        b = F.broadcast(b)
    pairs = (
        c.join(b, ["band_index", "band_sig"])
        .select("batch_id", "corpus_id", "__sig_b", "__sig_c")
        .dropDuplicates(["batch_id", "corpus_id"])
    )
    est = minhash_jaccard_est(F.col("__sig_b"), F.col("__sig_c"), num_hashes)
    return pairs.select("batch_id", "corpus_id", est.alias("jaccard_est"))


def _large_star(D: DataFrame) -> DataFrame:
    """One large-star step (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): every node attaches its LARGER neighbors to
    the minimum of its closed neighborhood. Input/output edge lists are
    directed ``(hi, lo)`` with hi > lo; the step preserves connectivity
    and strictly flattens tall trees."""
    sym = D.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
        D.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    # v > u >= m, so the emitted (v, m) edge is already (hi, lo)-ordered
    return (
        sym.join(m.hint("shuffle_hash"), "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        .distinct()
    )


def _small_star(D: DataFrame) -> DataFrame:
    """One small-star step: every node points its SMALLER neighbors
    (and itself) at the minimum of those — the union-find "hook" move.
    lo >= m for every joined row, so outputs stay (hi, lo)-ordered."""
    m = D.groupBy("hi").agg(F.min("lo").alias("m"))
    j = D.join(m.hint("shuffle_hash"), "hi")
    a = j.where(F.col("lo") != F.col("m")).select(
        F.col("lo").alias("hi"), F.col("m").alias("lo")
    )
    b = j.select(F.col("hi"), F.col("m").alias("lo"))
    return a.unionByName(b).distinct()


def neardup_representatives(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    num_hashes: int = 16,
    bands: int = 4,
    rounds: int | None = None,
    max_rounds: int = 32,
    nodes: DataFrame | None = None,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Near-dup GROUPS instead of pairs: every doc maps to its group
    representative — the MIN id in its connected component of the
    shared-LSH-bucket graph — via alternating large-star / small-star
    contraction (Kiveris et al.) run TO FIXPOINT by default.

    Why groups: a corpus with k-way duplicate groups has O(k²) near-dup
    *pairs* per group — at 500k docs with 100-way groups that is 60M
    pairs (measured). The representative mapping is O(n) output and is
    what a dedup pipeline actually consumes (keep rep, drop rest).

    Shape (the round-2 version re-joined the full n×bands banded table
    every label-propagation round — 82.8 s at sf0.1):

    1. **Bucket contraction, once.** Each LSH bucket is a clique for
       connectivity, so it contracts to a star: edges
       ``(doc, bucket_min)``, deduplicated — O(n·bands) single-long
       pairs, no band-signature arrays. The banded table is touched
       exactly once. Preserves components exactly.
    2. **Alternating star rounds over the edge list only.** Each round
       is one large-star + one small-star — two groupBy+join passes
       over the shrinking edge table. Unlike min-label propagation
       (which walks one graph hop per round and needed 18 rounds on
       the sf0.1 chain structure), the alternation contracts the graph
       itself and converges in O(log² n) rounds (6 measured at sf0.1).
       At fixpoint the edge list IS the answer: a star forest
       ``doc -> component_min``.

    **Iteration hygiene — why each round materializes to parquet in a
    scratch dir:** Spark's size-only stats estimator computes a join's
    ``sizeInBytes`` as the *product* of its children's, and
    checkpoint/localCheckpoint PRESERVE estimated stats — so a
    self-joining iteration squares the BigInt estimate every round;
    around round 18 the planner burns minutes multiplying million-digit
    BigIntegers (measured: 0.2 s/round exploding to 140 s/round, flat
    plans, no GC — the hot frames are BigInteger.multiplyToomCook3
    under SizeInBytesOnlyStatsPlanVisitor.visitJoin). A parquet
    round-trip resets stats to real file sizes AND truncates lineage —
    it is also exactly what a cluster deployment wants (reliable
    checkpoint on shared storage; pass ``scratch_dir``).

    ``rounds=N`` caps the alternation instead (a long duplicate chain
    may then stay split — only safe when chains are known short).
    ``nodes`` optionally supplies the full id universe (one column
    ``id_col``) so ``sigs`` need not be re-derived for the final
    label join; singletons keep their own id as representative.
    The convergence witness is exact: the (count, sum(hi), sum(lo))
    decimal triple of the edge list is stable across a round only at
    the star-forest fixpoint; ``max_rounds`` bounds pathological
    corpora and non-convergence raises rather than returning split
    groups silently.
    """
    import shutil
    import tempfile

    from pyspark.sql import Window

    from ..caching import persist_tracked

    spark = sigs.sparkSession
    if nodes is None:
        # the final label join needs the id universe; cache sigs so it
        # is not re-derived through the (expensive) shingle lineage
        sigs = persist_tracked(sigs)
        nodes = sigs.select(id_col)
    # band through the shared projection (r10 review: this site had
    # its own copy of the slice arithmetic, bypassing the
    # non-divisibility ValueError banded_signatures raises — a
    # non-divisible split would silently band only the first
    # bands*(num_hashes//bands) components and weaken recall)
    banded = banded_signatures(
        sigs, id_col, sig_col, num_hashes, bands,
        out_id=id_col, out_sig="__full_sig",
    ).drop("__full_sig")
    w = Window.partitionBy("band_index", "band_sig")
    star = (
        banded.withColumn("__bmin", F.min(id_col).over(w))
        .filter(F.col(id_col) != F.col("__bmin"))
        .select(F.col(id_col).alias("hi"), F.col("__bmin").alias("lo"))
        .distinct()
    )

    own_scratch = scratch_dir is None
    if own_scratch:
        scratch_dir = tempfile.mkdtemp(prefix="sparkgraft_cc_")
    # Loop-scoped execution width, DERIVED FROM THE DATA (r16, guide
    # §2 "make partitioning scale-adaptive rather than a constant"):
    # once the contracted star edge list is on disk its size is
    # known exactly. When the whole list fits a handful of 64 MB
    # partitions, AQE's per-stage re-optimization submits ~5 sub-jobs
    # per round for MB-scale exchanges — measured 40 jobs / 2.2 s for
    # a 6-round fixpoint at sf0.1 vs 1.95 s with AQE off and an
    # 8-partition width (A/B receipt in OPTIMIZATION_r16.md). Above
    # the gate nothing changes: AQE (skew-split + coalescing) is the
    # right posture for a corpus-scale edge list, and the width is
    # ceil(bytes / 64 MB), not a core-count constant.
    _CC_SMALL_BYTES = 512 * 2**20
    _CC_PART_BYTES = 64 * 2**20

    def _dir_bytes(p: str) -> int:
        import os as _os

        return sum(
            _os.path.getsize(_os.path.join(r, f))
            for r, _d, fs in _os.walk(p)
            for f in fs
        )

    _conf = spark.conf
    _old_aqe = _conf.get("spark.sql.adaptive.enabled")
    _old_parts = _conf.get("spark.sql.shuffle.partitions")

    def _scope_loop_width(edge_bytes: int) -> None:
        if edge_bytes <= _CC_SMALL_BYTES:
            _conf.set("spark.sql.adaptive.enabled", "false")
            _conf.set(
                "spark.sql.shuffle.partitions",
                str(max(8, -(-edge_bytes // _CC_PART_BYTES))),
            )

    def _restore_width() -> None:
        _conf.set("spark.sql.adaptive.enabled", _old_aqe)
        _conf.set("spark.sql.shuffle.partitions", _old_parts)

    try:
        star.write.mode("overwrite").parquet(scratch_dir + "/edges_0")
        D = spark.read.parquet(scratch_dir + "/edges_0")
        _scope_loop_width(_dir_bytes(scratch_dir + "/edges_0"))
        # Convergence witness: count + endpoint sums + an
        # order-independent content hash (sum of xxhash64(hi, lo)).
        # The sums alone are necessary but not sufficient — a round
        # that rewired edges while preserving them would be declared
        # converged; the per-edge hash sum makes a false fixpoint a
        # 2^-64-ish collision instead of a plausible event.
        triple = [
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("hi").cast("decimal(38,0)")).alias("sh"),
            F.sum(F.col("lo").cast("decimal(38,0)")).alias("sl"),
            F.sum(
                F.xxhash64(F.col("hi"), F.col("lo")).cast("decimal(38,0)")
            ).alias("hx"),
        ]
        if rounds is not None:
            for rnd in range(rounds):
                out = _small_star(_large_star(D))
                out.write.mode("overwrite").parquet(
                    scratch_dir + f"/edges_{rnd % 2 + 1}"
                )
                D = spark.read.parquet(scratch_dir + f"/edges_{rnd % 2 + 1}")
        else:
            from pyspark.sql import Observation

            prev = None
            converged = False
            for rnd in range(max_rounds):
                out = _small_star(_large_star(D))
                # the convergence triple rides the WRITE job as an
                # Observation instead of a second job re-reading the
                # just-written parquet (r15 optimization: one job per
                # round instead of two, one less scan per round; the
                # metrics are computed over the exact rows written, so
                # fixpoint detection — and therefore the round count
                # and the result — is unchanged)
                obs = Observation(f"cc_round_{rnd}")
                out = out.observe(obs, *triple)
                out.write.mode("overwrite").parquet(
                    scratch_dir + f"/edges_{rnd % 2 + 1}"
                )
                D = spark.read.parquet(scratch_dir + f"/edges_{rnd % 2 + 1}")
                st = obs.get
                key = (st["c"], st["sh"], st["sl"], st["hx"])
                if key == prev:
                    converged = True
                    break
                prev = key
            if not converged:
                # Spark documents that observed metrics on batch
                # queries MAY double-report if a write stage is retried
                # (r15 ADVICE): a corrupted triple can only DELAY the
                # detected fixpoint, never fake one (a false match
                # would need the corrupted triple to collide with the
                # previous round's key), so the labels stay correct —
                # but the max_rounds exhaustion could be spurious.
                # Before failing, run ONE authoritative extra round
                # with both triples computed by plain agg jobs (immune
                # to double-reporting) and accept the fixpoint if it
                # holds. Failure-path only: the happy path pays zero
                # extra jobs.
                ra = D.agg(*triple).head()
                out = _small_star(_large_star(D))
                out.write.mode("overwrite").parquet(
                    scratch_dir + f"/edges_{max_rounds % 2 + 1}"
                )
                D = spark.read.parquet(
                    scratch_dir + f"/edges_{max_rounds % 2 + 1}"
                )
                rb = D.agg(*triple).head()
                fields = ("c", "sh", "sl", "hx")
                if tuple(ra[f] for f in fields) == tuple(
                    rb[f] for f in fields
                ):
                    converged = True
            if not converged:
                raise RuntimeError(
                    f"neardup_representatives did not converge within "
                    f"max_rounds={max_rounds}; raise max_rounds or pass an "
                    f"explicit rounds= to accept a bounded contraction"
                )
        # the label join below is corpus-scale — run it (and anything
        # after) at the session's width/AQE posture, not the loop's
        _restore_width()
        # star forest -> labels; min(lo) per hi is a no-op at fixpoint
        # but keeps bounded-rounds output well-defined
        roots = D.groupBy("hi").agg(F.min("lo").alias("__root"))
        labels = (
            nodes.join(
                roots.select(
                    F.col("hi").alias(id_col), F.col("__root")
                ).hint("shuffle_hash"),
                id_col,
                "left",
            )
            .select(
                F.col(id_col),
                F.coalesce(F.col("__root"), F.col(id_col)).alias("group_rep"),
            )
        )
        if own_scratch:
            # pin the result before the scratch files disappear (single
            # checkpoint, not iterated — the stats pitfall above needs
            # compounding rounds to bite)
            labels = labels.localCheckpoint(eager=True)
        return labels
    finally:
        _restore_width()  # idempotent; covers mid-loop exceptions
        if own_scratch:
            shutil.rmtree(scratch_dir, ignore_errors=True)


def simhash_agg(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 48,
    out_col: str = "simhash",
) -> DataFrame:
    """SimHash fingerprints in the scale shape: explode token hashes ->
    ONE groupBy(id) with ``bits`` conditional integer sums (whole-stage
    codegen + map-side partial agg — same shape as
    text_analysis.fingerprint). 48-bit token hashes (12 md5 hex chars)
    keep fingerprints up to 48 bits exact cross-engine.

    Empirical sizing on the shared-vocab fixture corpus: 16/24/32-bit
    fingerprints drown in false positives at Hamming<=3 (15k/2.3k FP
    pairs at sf0.01); 48-bit gives 540 total pairs, dominated by the
    true near-dup twins. Google's production choice is 64-bit, k=3 —
    same construction, wider hash.
    """
    # at least 6 hex chars so bits<=24 fingerprints are bit-identical
    # to the element_hashes default (with_simhash / the 16-bit oracle)
    nhex = max(6, (bits + 3) // 4)
    hashed = df.select(
        id_col,
        F.explode_outer(tokens(F.col(text_col))).alias("__tok"),
    ).select(id_col, md5_int(F.col("__tok"), nhex).alias("h"))
    # sum of +-1 over bit b  >0  <=>  2*popcount_b > n_tokens: plain
    # bitwise sums (branch-free, codegen'd) instead of when(+-1) CASEs
    bit_sums = hashed.groupBy(id_col).agg(
        F.count("h").alias("__n"),
        *[
            F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"__bit{b}")
            for b in range(bits)
        ],
    )
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp + F.when(
            F.col(f"__bit{b}") * 2 > F.col("__n"), F.lit(2**b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bit_sums.select(id_col, fp.alias(out_col))


def simhash_candidate_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "simhash",
    bits: int = 48,
    chunks: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs via the banded Hamming join: split the
    fingerprint into ``chunks`` bit-chunks; any pair within Hamming
    distance ``max_hamming`` (< chunks, pigeonhole) shares at least one
    EQUAL chunk, so an equi-join on (chunk_index, chunk_value) yields a
    complete candidate set — never the O(n^2) cross product. Exact
    ``bit_count(xor)`` verifies candidates.

    Scale: shuffle keys are (chunk_index, 12-bit value) — bucket sizes
    ~n/2^width; AQE skew-join splits hot buckets. Output is the exact
    Hamming<=k join, deterministically.
    """
    # ValueError, not assert: an assert is stripped under python -O,
    # silently returning an incomplete candidate set (r10 review)
    if chunks <= max_hamming:
        raise ValueError(
            f"pigeonhole requires chunks ({chunks}) > max_hamming "
            f"({max_hamming}): a pair may differ in every chunk and "
            f"share no equal join key"
        )
    width = bits // chunks
    mask = (1 << width) - 1
    from ..caching import persist_tracked

    fps = persist_tracked(fps)
    banded = fps.select(
        F.col(id_col),
        F.col(fp_col),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col(fp_col), c * width).bitwiseAND(F.lit(mask))
                    for c in range(chunks)
                ]
            )
        ).alias("chunk_index", "chunk_val"),
    )
    left, right = banded.alias("l"), banded.alias("r")
    hamming = F.bit_count(
        F.col(f"l.{fp_col}").bitwiseXOR(F.col(f"r.{fp_col}"))
    ).cast("int")
    # Verify INSIDE the join projection and filter before the dedup:
    # on a homogeneous corpus the biased fingerprint bits make chunk
    # buckets heavily collide (candidates ~O(n*bucket)), so the
    # xor+bit_count must run codegen'd in the join stage — an aggregate
    # over the raw candidate stream (the dropDuplicates-first shape)
    # was the whole cost: 6.6s -> this shape, at sf0.1.
    pairs = (
        left.join(
            right,
            (F.col("l.chunk_index") == F.col("r.chunk_index"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    bits: int = 16,
    out_col: str = "simhash",
) -> DataFrame:
    """Append a SimHash fingerprint (long) over whitespace tokens
    (token hashes materialized once; bits derived by shift+mask)."""
    tmp = f"__{out_col}_hs"
    return (
        df.withColumn(tmp, element_hashes(tokens(F.col(text_col))))
        .withColumn(out_col, simhash_from_hashes(F.col(tmp), bits))
        .drop(tmp)
    )


def ngram_jaccard(a: Column, b: Column, n: int = 4) -> Column:
    """Exact set-Jaccard of character n-grams (verification metric for
    candidate pairs; array_intersect/union are distinct-set semantics).
    """
    ga, gb = char_ngrams(a, n), char_ngrams(b, n)
    inter = F.size(F.array_intersect(ga, gb)).cast("double")
    union = F.size(F.array_union(ga, gb)).cast("double")
    return inter / union


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b) with cosine >= threshold.

    ``block_col`` bounds the self-join to same-block pairs — at 100 TB
    you never run the unblocked O(n^2); use LSH buckets (operators/ann)
    or a semantic blocking key as here.
    """
    import numpy as np
    import pandas as pd

    if block_col is None:
        # unblocked exact pairing: single group (never do this at scale)
        df = df.withColumn("__blk", F.lit(0))
        block_col = "__blk"

    # pre-filter margin: the final Spark-side filter is on the value
    # ROUNDED to 6 decimals (HALF_UP), so a raw sim as low as
    # threshold - 5e-7 can still round up to pass; the kernel must not
    # drop it. 1e-6 covers that plus float slack.
    pre_threshold = threshold - 1e-6

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # Dense matmul per block — the FAISS-shaped inner loop; Arrow
        # hands us the block columnar, numpy/BLAS does pairs*dim flops.
        # CHUNKED over rows: memory is O(chunk * block), never
        # O(block^2), and the threshold filter runs per-chunk BEFORE
        # any pair list materializes — only survivors allocate. A
        # 10^6-row block costs the same peak memory as a 10^3-row one;
        # this is what lets the same kernel survive a 100 TB corpus
        # whose blocking key produces fat blocks.
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
        mat = np.array(pdf[vec_col].tolist(), dtype="float64")
        norms = np.linalg.norm(mat, axis=1)
        # bound the sims slab at chunk*n <= 4M float64s (~32 MB)
        chunk = max(1, min(4096, 4_000_000 // n))
        cols = np.arange(n)
        out_a, out_b, out_s = [], [], []
        for start in range(0, n - 1, chunk):
            end = min(start + chunk, n)
            # same op order as the unchunked form: dot products first,
            # then elementwise divide by the norm product — keeps the
            # floats bit-identical to the oracle-verified kernel
            sims = (mat[start:end] @ mat.T) / np.outer(
                norms[start:end], norms
            )
            keep = (cols[None, :] > np.arange(start, end)[:, None]) & (
                sims >= pre_threshold
            )
            ia, ib = np.nonzero(keep)
            if len(ia):
                out_a.append(ids[ia + start])
                out_b.append(ids[ib])
                out_s.append(sims[ia, ib])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine_sim": np.concatenate(out_s),
            }
        )

    pairs = df.select(id_col, vec_col, block_col).groupBy(block_col).applyInPandas(
        block_pairs, "id_a long, id_b long, cosine_sim double"
    )
    # round JVM-side (BigDecimal HALF_UP — matches the oracle's round)
    return pairs.select(
        "id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim")
    ).filter(F.col("cosine_sim") >= threshold)
