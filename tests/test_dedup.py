from __future__ import annotations

from pyspark.sql import functions as F

from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
    exact_dedup,
    minhash_candidate_pairs,
    ngram_jaccard,
    with_minhash,
    with_simhash,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


BASE = (
    "spark engines shuffle data across partitions while catalyst optimizes the plan "
    "and tungsten generates code for the hot loops of a columnar scan"
)


def test_exact_dedup_groups(spark):
    df = _docs(spark, [BASE, BASE, "other text", BASE])
    out = exact_dedup(df).collect()
    by_kept = {r["kept_doc_id"]: r["dup_count"] for r in out}
    assert by_kept == {0: 3, 2: 1}


def test_minhash_identical_equal_sigs(spark):
    df = with_minhash(_docs(spark, [BASE, BASE]), num_hashes=8)
    sigs = [r["minhash"] for r in df.collect()]
    assert sigs[0] == sigs[1]
    assert len(sigs[0]) == 8


def test_minhash_lsh_finds_neardups(spark):
    near = BASE[:-10]  # drop tail -> high shingle overlap
    far = "completely different content about databases and storage layers xyz"
    df = with_minhash(_docs(spark, [BASE, near, far]), num_hashes=8)
    pairs = minhash_candidate_pairs(df, num_hashes=8, bands=4).collect()
    keys = {(r["id_a"], r["id_b"]): r["jaccard_est"] for r in pairs}
    assert (0, 1) in keys
    assert keys[(0, 1)] >= 0.5
    assert (0, 2) not in keys or keys[(0, 2)] < 0.5


def test_ngram_jaccard_bounds(spark):
    df = spark.createDataFrame([(BASE, BASE), (BASE, "zzzz qqqq")], ["a", "b"])
    out = df.select(ngram_jaccard(F.col("a"), F.col("b")).alias("j")).collect()
    assert out[0]["j"] == 1.0
    assert out[1]["j"] < 0.1


def test_neardup_representatives_group_duplicates(spark):
    """Star-contraction labels: duplicates collapse to one rep; the
    unrelated doc keeps its own label."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        minhash_signatures_agg,
        neardup_representatives,
    )

    near = BASE[:-8]
    far = "entirely unrelated content about kernel schedulers and numa nodes"
    df = _docs(spark, [BASE, near, far, BASE])
    sigs = minhash_signatures_agg(df, num_hashes=16, ngram=7)
    reps = {r["doc_id"]: r["group_rep"] for r in
            neardup_representatives(sigs, num_hashes=16, bands=4).collect()}
    assert reps[0] == reps[1] == reps[3] == 0
    assert reps[2] == 2


def test_neardup_representatives_chain_fixpoint(spark):
    """A 5-link duplicate CHAIN (doc d shares a band bucket only with
    d±1) must collapse to ONE representative under the default fixpoint
    mode — and provably does NOT under a bounded radius (rounds=2),
    the round-1 regression this test pins."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        neardup_representatives,
    )

    def band_val(d, b):
        # edge e_d links docs d and d+1 through band d % 4
        if d <= 4 and b == d % 4:
            return [20000 + d] * 4
        if d >= 2 and b == (d - 1) % 4:
            return [20000 + d - 1] * 4
        return [d * 100 + b] * 4

    rows = [
        (d, [x for b in range(4) for x in band_val(d, b)]) for d in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, minhash array<bigint>")
    fix = {
        r["doc_id"]: r["group_rep"]
        for r in neardup_representatives(df, num_hashes=16, bands=4).collect()
    }
    assert fix == {d: 1 for d in range(1, 6)}, fix
    # (bounded-radius split behavior is pinned on the 40-link chain
    # below — one round's hop+jumps radius already covers 5 links)


def test_neardup_representatives_long_chain_converges(spark):
    """A 40-link chain must collapse to one representative WITHIN the
    round budget — pins the pointer-jumping (path-halving) speedup:
    hop-only propagation would need ~40 rounds and raise."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        neardup_representatives,
    )

    n = 40

    def band_val(d, b):
        if d <= n - 1 and b == d % 4:
            return [90000 + d] * 4
        if d >= 2 and b == (d - 1) % 4:
            return [90000 + d - 1] * 4
        return [d * 1000 + b] * 4

    rows = [
        (d, [x for b in range(4) for x in band_val(d, b)]) for d in range(1, n + 1)
    ]
    df = spark.createDataFrame(rows, "doc_id long, minhash array<bigint>")
    fix = {
        r["doc_id"]: r["group_rep"]
        for r in neardup_representatives(df, num_hashes=16, bands=4).collect()
    }
    assert fix == {d: 1 for d in range(1, n + 1)}
    # a bounded single round (hop + doubling jumps, radius ~5) cannot
    # reach across 39 links — the far end stays split
    bounded = {
        r["doc_id"]: r["group_rep"]
        for r in neardup_representatives(
            df, num_hashes=16, bands=4, rounds=1
        ).collect()
    }
    assert bounded[n] != 1


def test_signatures_agg_matches_fold(spark):
    """The codegen explode+groupBy signature shape must produce the
    exact integers of the array-fold shape."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        minhash_signatures_agg,
    )

    df = _docs(spark, [BASE, BASE[:-8], "short one"])
    fold = {r["doc_id"]: r["minhash"] for r in
            with_minhash(df, num_hashes=16, ngram=7).select("doc_id", "minhash").collect()}
    agg = {r["doc_id"]: r["minhash"] for r in
           minhash_signatures_agg(df, num_hashes=16, ngram=7).collect()}
    assert fold == agg


def test_simhash_banded_hamming_join(spark):
    """48-bit simhash + banded Hamming join: the near pair survives at
    Hamming<=3; the unrelated doc pairs with nobody."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        simhash_agg,
        simhash_candidate_pairs,
    )

    # only mutate the tail token: on a 22-token text each changed token
    # moves every bit-sum by +-2, so a 1-token edit stays within
    # Hamming 3 but a multi-token edit may not (verified offline)
    near = BASE[:-4]
    far = "entirely unrelated content about kernel schedulers and numa nodes"
    fps = simhash_agg(_docs(spark, [BASE, near, far]), bits=48)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_candidate_pairs(fps, bits=48).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= 3
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_agg_matches_fold(spark):
    """The explode+groupBy simhash shape must produce the exact integer
    of the array-fold shape at the same bit width."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        simhash_agg,
    )

    df = _docs(spark, [BASE, BASE[:-8], "short one"])
    fold = {r["doc_id"]: r["simhash"] for r in with_simhash(df, bits=16).select("doc_id", "simhash").collect()}
    agg = {r["doc_id"]: r["simhash"] for r in simhash_agg(df, bits=16).collect()}
    assert fold == agg


def test_bpe_token_count(spark):
    from pdf_using_hugging_face_and_vector_database_spark.functions.text import (
        bpe_token_count,
    )

    df = spark.createDataFrame(
        [("hello world",), ("a1b2, ok!",), ("",)], ["text"]
    )
    out = [r["n"] for r in df.select(bpe_token_count("text").alias("n")).collect()]
    # "hello","world" = 2 ; "a","1","b","2",",","ok","!" = 7 ; "" = 0
    assert out == [2, 7, 0]


def test_simhash_near_for_similar(spark):
    df = with_simhash(_docs(spark, [BASE, BASE, "unrelated words entirely"]))
    s = [r["simhash"] for r in df.orderBy("doc_id").collect()]
    assert s[0] == s[1]
    assert 0 <= s[0] < 2**16
    assert s[0] != s[2]


def test_persisted_signatures_staleness_rebuild(spark, tmp_path, monkeypatch):
    """The fingerprint-keyed signature store must rebuild when the
    source data changes and reuse when it doesn't."""
    import os

    from pdf_using_hugging_face_and_vector_database_spark.operators import ann
    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        persisted_signatures,
    )

    monkeypatch.setattr(ann, "INDEX_ROOT", str(tmp_path / "idx"))
    sf_dir = tmp_path / "sfX"
    sf_dir.mkdir()
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(sf_dir / "documents.parquet"))
    corpus = spark.read.parquet(str(sf_dir / "documents.parquet"))

    s1 = {
        r["doc_id"]: r["minhash"]
        for r in persisted_signatures(
            spark, str(sf_dir), corpus, 16, 3, "word", "t"
        ).collect()
    }
    marker = os.path.join(
        str(tmp_path / "idx"),
        f"minhash_{ann.dataset_dir_key(str(sf_dir))}_t",
        "meta.json",
    )
    mtime1 = os.path.getmtime(marker)

    # unchanged source -> reuse (marker untouched)
    persisted_signatures(spark, str(sf_dir), corpus, 16, 3, "word", "t").count()
    assert os.path.getmtime(marker) == mtime1

    # changed source -> rebuild with the new corpus (no sleep needed:
    # the fingerprint reads st_mtime_ns, so a same-second rewrite at
    # identical byte size is still detected)
    docs2 = spark.createDataFrame(
        [(1, "totally different words here now"), (2, "and these too friend")],
        "doc_id long, text string",
    )
    docs2.write.mode("overwrite").parquet(str(sf_dir / "documents.parquet"))
    corpus2 = spark.read.parquet(str(sf_dir / "documents.parquet"))
    s2 = {
        r["doc_id"]: r["minhash"]
        for r in persisted_signatures(
            spark, str(sf_dir), corpus2, 16, 3, "word", "t"
        ).collect()
    }
    assert os.path.getmtime(marker) > mtime1
    assert s1[1] != s2[1]


def test_dataset_fingerprint_and_dir_key_sensitivity(tmp_path):
    """ADVICE round 3: the fingerprint must change for a same-size
    rewrite (mtime_ns) and for renamed files; the store dir key must
    differ for same-basename dirs under different parents."""
    import os

    from pdf_using_hugging_face_and_vector_database_spark.operators.ann import (
        dataset_dir_key,
        dataset_fingerprint,
    )

    d = tmp_path / "data"
    d.mkdir()
    f = d / "part-0.parquet"
    f.write_bytes(b"aaaa")
    fp1 = dataset_fingerprint(str(d))
    # same size, rewritten (mtime_ns differs even within one second)
    f.write_bytes(b"bbbb")
    fp2 = dataset_fingerprint(str(d))
    assert fp1 != fp2
    # same bytes/sizes but a renamed file changes the fingerprint
    st = os.stat(f)
    os.rename(f, d / "part-1.parquet")
    os.utime(d / "part-1.parquet", ns=(st.st_atime_ns, st.st_mtime_ns))
    fp3 = dataset_fingerprint(str(d))
    assert fp3 != fp2

    a = tmp_path / "p1" / "sf0.1"
    b = tmp_path / "p2" / "sf0.1"
    a.mkdir(parents=True)
    b.mkdir(parents=True)
    assert dataset_dir_key(str(a)) != dataset_dir_key(str(b))
    assert dataset_dir_key(str(a)) == dataset_dir_key(str(a) + "/")


def test_incremental_pairs_batch_vs_corpus(spark):
    """Batch docs match their corpus near-dup source (est >= 0.5) and
    novel batch docs produce no pair; corpus-corpus pairs never appear
    (the whole point of the incremental shape)."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        incremental_candidate_pairs,
        minhash_signatures_agg,
    )

    corpus = _docs(spark, [BASE, BASE.replace("spark", "flink"), "zebra " * 30])
    batch = spark.createDataFrame(
        [(100, BASE[:-8]), (101, "totally unrelated fresh content " * 5)],
        ["doc_id", "text"],
    )
    csigs = minhash_signatures_agg(corpus, num_hashes=16, ngram=4)
    bsigs = minhash_signatures_agg(batch, num_hashes=16, ngram=4)
    pairs = incremental_candidate_pairs(
        csigs, bsigs, num_hashes=16, bands=4
    ).collect()
    # every pair is batch-id x corpus-id
    assert all(r.batch_id >= 100 and r.corpus_id < 100 for r in pairs)
    strong = {
        (r.batch_id, r.corpus_id) for r in pairs if r.jaccard_est >= 0.5
    }
    assert (100, 0) in strong
    assert all(b != 101 for b, _ in strong)


def test_banded_signatures_partition_signature_exactly(spark):
    """Property: the band slices partition the signature — concatenating
    band_sig over band_index 0..bands-1 reproduces the signature
    exactly, for every (num_hashes, bands) divisible pair. Guards the
    single-source banding arithmetic every dedup path now shares."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        banded_signatures,
        minhash_signatures_agg,
    )

    docs = _docs(spark, [BASE, BASE[: len(BASE) // 2], "zebra " * 20])
    for num_hashes, bands in [(16, 4), (16, 8), (12, 3)]:
        sigs = minhash_signatures_agg(docs, num_hashes=num_hashes, ngram=4)
        banded = banded_signatures(
            sigs, "doc_id", "minhash", num_hashes, bands, "doc_id", "minhash"
        )
        rows = banded.collect()
        assert all(len(r.band_sig) == num_hashes // bands for r in rows)
        by_doc = {}
        for r in sorted(rows, key=lambda r: (r.doc_id, r.band_index)):
            by_doc.setdefault(r.doc_id, []).extend(r.band_sig)
        full = {r.doc_id: list(r.minhash) for r in sigs.collect()}
        assert by_doc == full


def test_banded_signatures_rejects_non_divisible(spark):
    import pytest

    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        banded_signatures,
        minhash_signatures_agg,
    )

    sigs = minhash_signatures_agg(_docs(spark, [BASE]), num_hashes=10, ngram=4)
    with pytest.raises(ValueError, match="divisible"):
        banded_signatures(sigs, "doc_id", "minhash", 10, 4, "id", "sig")


def test_incremental_pairs_empty_batch(spark):
    """An empty daily batch must produce zero pairs, not an error."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        incremental_candidate_pairs,
        minhash_signatures_agg,
    )

    corpus = minhash_signatures_agg(_docs(spark, [BASE]), num_hashes=16, ngram=4)
    empty = corpus.filter("doc_id < 0")
    assert (
        incremental_candidate_pairs(corpus, empty, num_hashes=16, bands=4).count()
        == 0
    )


def test_lsh_exact_audit_semantics(spark, sf_dir):
    """The audit's internal consistency: hits <= both sides, recall
    matches the quotient, and the gate reflects the floor."""
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        LSH_AUDIT_FLOOR,
        lsh_exact_audit,
    )

    (r,) = lsh_exact_audit(spark, sf_dir).collect()
    assert r.n_hits <= r.n_truth and r.n_hits <= r.n_candidates
    assert r.recall == round(r.n_hits / r.n_truth, 6)
    assert r.recall_ok == (r.recall >= LSH_AUDIT_FLOOR)
    assert r.recall_ok  # the configured bands must clear the floor


def test_property_simhash_banded_join_is_exact_hamming_join(spark):
    """Randomized sweep (fixed seed): the banded Hamming join over
    random 48-bit fingerprints — biased so many pairs sit NEAR the
    max_hamming boundary — must equal the brute-force exact
    Hamming <= k join (pigeonhole completeness AND the verify's
    precision), pairs and distances both."""
    import random

    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        simhash_candidate_pairs,
    )

    rng = random.Random(0x51A4)
    bits, k = 48, 3
    base = [rng.getrandbits(bits) for _ in range(12)]
    fps = []
    i = 0
    for b in base:
        # a cluster of mutations around each base: 0..5 bit flips
        for _ in range(rng.randint(1, 6)):
            v = b
            for bit in rng.sample(range(bits), rng.randint(0, 5)):
                v ^= 1 << bit
            fps.append((i, v))
            i += 1
    df = spark.createDataFrame(fps, "doc_id long, simhash long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_candidate_pairs(df, max_hamming=k).collect()
    }
    want = {}
    for (ia, va) in fps:
        for (ib, vb) in fps:
            if ia < ib and bin(va ^ vb).count("1") <= k:
                want[(ia, ib)] = bin(va ^ vb).count("1")
    assert got == want


def test_property_representatives_match_union_find(spark):
    """Randomized sweep (fixed seed): random per-band bucket
    assignments induce arbitrary topologies (co-bucket cliques,
    chains-of-cliques, isolated docs); the star-contraction fixpoint
    must map every doc to the MIN id of its connected component,
    exactly as a plain-Python union-find over the same co-bucket
    graph."""
    import random

    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        neardup_representatives,
    )

    rng = random.Random(0xCC)
    n_docs, bands, width = 40, 4, 4

    rows = []
    assign = {}
    for d in range(1, n_docs + 1):
        sig = []
        for b in range(bands):
            # small per-band pools force shared buckets; the 1000*b
            # offset keeps collisions WITHIN a band only
            label = 1000 * b + rng.randint(0, 13)
            assign[(d, b)] = label
            sig.extend([label] * width)
        rows.append((d, sig))

    # reference: union-find over co-bucket cliques
    parent = list(range(n_docs + 1))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    buckets = {}
    for (d, b), label in assign.items():
        buckets.setdefault((b, label), []).append(d)
    for members in buckets.values():
        for m in members[1:]:
            ra, rb = find(members[0]), find(m)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in range(1, n_docs + 1)}

    df = spark.createDataFrame(rows, "doc_id long, minhash array<bigint>")
    got = {
        r["doc_id"]: r["group_rep"]
        for r in neardup_representatives(
            df, num_hashes=bands * width, bands=bands
        ).collect()
    }
    assert got == want


def test_corpus_salt_rotates_signature_store(spark, tmp_path, monkeypatch):
    """r9 review fix: the corpus DERIVATION salt is part of the store
    fingerprint — a changed corpus_salt (a truncation constant or
    builder code-token change at the call site) must rebuild under the
    same tag, never serve the previous derivation's rows; an unchanged
    salt must keep serving."""
    import os

    from pdf_using_hugging_face_and_vector_database_spark.operators import ann
    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        persisted_signatures,
    )

    monkeypatch.setattr(ann, "INDEX_ROOT", str(tmp_path / "idx"))
    sf_dir = tmp_path / "sfY"
    sf_dir.mkdir()
    spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(sf_dir / "documents.parquet"))
    corpus = spark.read.parquet(str(sf_dir / "documents.parquet"))

    marker = os.path.join(
        str(tmp_path / "idx"),
        f"minhash_{ann.dataset_dir_key(str(sf_dir))}_t",
        "meta.json",
    )
    persisted_signatures(
        spark, str(sf_dir), corpus, 16, 3, "word", "t", corpus_salt="trunc40"
    ).count()
    mtime1 = os.path.getmtime(marker)
    # same salt -> served, marker untouched
    persisted_signatures(
        spark, str(sf_dir), corpus, 16, 3, "word", "t", corpus_salt="trunc40"
    ).count()
    assert os.path.getmtime(marker) == mtime1
    # changed derivation salt, same tag -> rebuild
    persisted_signatures(
        spark, str(sf_dir), corpus, 16, 3, "word", "t", corpus_salt="trunc60"
    ).count()
    assert os.path.getmtime(marker) > mtime1


def test_banding_guards_are_uniform(spark):
    """r10 review: every banding site fails fast on bad splits —
    neardup_representatives previously had its own copy of the slice
    arithmetic that silently dropped trailing signature components on
    a non-divisible num_hashes/bands split; simhash's pigeonhole
    precondition was an assert (stripped under python -O)."""
    import pytest

    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        neardup_representatives,
        simhash_candidate_pairs,
    )

    sigs = spark.createDataFrame(
        [(1, [1, 2, 3, 4])], "doc_id long, minhash array<long>"
    )
    with pytest.raises(ValueError, match="divisible"):
        neardup_representatives(
            sigs, id_col="doc_id", sig_col="minhash", num_hashes=4, bands=3
        ).collect()
    fps = spark.createDataFrame([(1, 5)], "doc_id long, simhash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_candidate_pairs(fps, chunks=3, max_hamming=3)


def test_element_hashes_xxhash64_is_low_bit_mask(spark):
    """The production (non-oracle) 24-bit fold must be the raw
    xxhash64's LOW BITS (r14, the queued r13 nit): the old abs()+modulo
    fold could never actually emit a negative — abs(Long.MIN_VALUE)
    overflows to itself but 2^24 divides 2^63 so the remainder was
    exactly 0 — yet it folded h and -h onto the same bucket and
    diverged from the low-bit mask on every negative raw hash. The
    expectation is derived from the raw xxhash64 primitive directly,
    and the sample provably contains negative raws — exactly where the
    two folds differ."""
    from pdf_using_hugging_face_and_vector_database_spark.functions.hashing import (
        element_hashes,
    )

    words = [f"w{i}" for i in range(64)]
    df = spark.createDataFrame([(words,)], "arr: array<string>")
    got = df.select(
        element_hashes(F.col("arr"), hash_fn="xxhash64").alias("h")
    ).head()["h"]
    raw = df.select(
        F.transform("arr", lambda s: F.xxhash64(s)).alias("r")
    ).head()["r"]
    assert any(r < 0 for r in raw), "sample must contain negative raw hashes"
    assert got == [r & 0xFFFFFF for r in raw]
    assert all(0 <= h < (1 << 24) for h in got)


def test_signatures_agg_xxhash64_matches_python_reference(spark):
    """The agg-shaped xxhash64 signature path (the second fold site)
    must equal a plain-Python reference: collect the raw xxhash64 of
    each word-3 shingle, mask the low 24 bits, run the (a*h+b)%p
    permutation mins in Python. Fails on the abs()+modulo fold for any
    doc whose shingles draw a negative raw hash (this one does)."""
    from pdf_using_hugging_face_and_vector_database_spark.functions.hashing import (
        P_MINHASH,
        minhash_params,
    )
    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        minhash_signatures_agg,
    )

    df = _docs(spark, [BASE])
    sig = minhash_signatures_agg(
        df, num_hashes=8, ngram=3, shingle="word", hash_fn="xxhash64"
    ).head()["minhash"]

    toks = BASE.split(" ")
    shingles = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    raw = (
        spark.createDataFrame([(s,) for s in shingles], ["s"])
        .select(F.xxhash64("s").alias("h"))
        .collect()
    )
    assert any(r["h"] < 0 for r in raw), "shingles must draw a negative raw hash"
    hs = [r["h"] & 0xFFFFFF for r in raw]
    want = [min((h * a + b) % P_MINHASH for h in hs) for a, b in minhash_params(8)]
    assert sig == want


def test_neardup_representatives_restores_session_width(spark):
    """The r16 loop-scoped width (AQE off + data-derived shuffle
    partitions while the contracted edge list is small) must restore
    the session's conf afterwards — labels unchanged either way."""
    from pdf_using_hugging_face_and_vector_database_spark.operators.dedup import (
        minhash_signatures_agg,
        neardup_representatives,
    )

    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    near = BASE[:-8]
    df = _docs(spark, [BASE, near, BASE])
    sigs = minhash_signatures_agg(df, num_hashes=16, ngram=7)
    reps = {r["doc_id"]: r["group_rep"] for r in
            neardup_representatives(sigs, num_hashes=16, bands=4).collect()}
    assert reps == {0: 0, 1: 0, 2: 0}
    assert spark.conf.get("spark.sql.adaptive.enabled") == old_aqe
    assert spark.conf.get("spark.sql.shuffle.partitions") == old_parts
