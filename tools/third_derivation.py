"""Correlated-error audit (r12 wave 1, r13 wave 2): PURE-PYTHON
third derivations of the most mechanics-like oracle replays.

The oracle gate proves Spark == DuckDB; a correlated error — both
engines replaying the same wrong formula — is invisible to it. This
script recomputes a set of replay-style rows from the raw parquet with
plain Python (hashlib/math/dict loops — no Spark, no SQL), and
compares against the DUCKDB ORACLE output. Python agreeing with the
replay is an independent implementation of the documented contract,
closing the correlated-error gap for these rows.

Float note: values are compared to 1e-9 of the 6dp-rounded oracle
output rather than exactly — Python's round() is banker's while
DuckDB/Spark round half-away-from-zero, and the audit must not hinge
on tie-rounding of irrational doubles.

Usage: python tools/third_derivation.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow.parquet as pq

import __spark_entry__ as entrymod

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def load(name):
    return pq.read_table(os.path.join(SF_DIR, f"{name}.parquet")).to_pylist()


def duck(name):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    res = con.sql(entrymod.oracle_sql()[name])
    cols = res.columns
    return [dict(zip(cols, r)) for r in res.fetchall()]


def md5_int(s: str, nhex: int = 6) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:nhex], 16)


def tokens(text):
    return [t for t in (text or "").split(" ") if t]


def close(a, b, tol=1e-9):
    if a is None or b is None:
        return a is None and b is None
    return abs(float(a) - float(b)) <= tol


FAIL = []


def check(name, ok, detail=""):
    print(("PASS " if ok else "FAIL ") + name + ("  " + detail if detail else ""))
    if not ok:
        FAIL.append(name)


# --- sessionize_events: plain-Python 30-min-gap sessionization -------
def audit_sessionize():
    events = load("events")
    per_user = defaultdict(list)
    for e in events:
        per_user[e["user_id"]].append((e["ts"], e["event_id"]))
    got = {}
    for u, evs in per_user.items():
        evs.sort()
        sessions = []
        last = None
        for ts, _eid in evs:
            # new session when gap is strictly > 30 minutes (the
            # documented explicit-lag sessionizer contract)
            if last is None or (ts - last).total_seconds() * 1e6 > 30 * 60 * 1e6:
                sessions.append(0)
            sessions[-1] += 1
            last = ts
        got[u] = (len(sessions), max(sessions), sum(sessions))
    want = {
        r["user_id"]: (r["n_sessions"], r["max_session_events"], r["total_events"])
        for r in duck("sessionize_events")
    }
    check("sessionize_events", got == want, f"{len(got)} users")


# --- lm_bigram_quality: dict-based MLE bigram cross-entropy ----------
def audit_lm_bigram():
    docs = load("documents")
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        LM_BAND_LOW,
        LM_BAND_MID,
    )

    big_by_doc = {}
    c2 = Counter()
    for d in docs:
        tk = tokens(d["text"])
        bgs = list(zip(tk, tk[1:]))
        big_by_doc[d["doc_id"]] = bgs
        c2.update(bgs)
    c1 = Counter()
    for (w1, _w2), c in c2.items():
        c1[w1] += c
    ok = True
    oracle = {r["doc_id"]: r for r in duck("lm_bigram_quality")}
    for doc_id, bgs in big_by_doc.items():
        lps = [round(-math.log(c2[b] / c1[b[0]]), 6) for b in bgs]
        n = len(lps)
        # decimal-exact sum of the 6dp terms, like both engines
        import decimal as _dec

        xent = (
            round(float(sum(_dec.Decimal(str(x)) for x in lps)) / n, 6)
            if n
            else None
        )
        band = (
            "high"
            if xent is None
            else ("low" if xent <= LM_BAND_LOW else ("mid" if xent <= LM_BAND_MID else "high"))
        )
        o = oracle[doc_id]
        # 2e-6: math.log vs DuckDB ln differ by an ulp, which at a
        # per-term 6dp tie flips one term by 1e-6 (the audit checks
        # the FORMULA, not cross-library libm tie-rounding)
        if not (o["n_bigrams"] == n and close(o["xent"], xent, 2e-6) and o["ppl_band"] == band):
            ok = False
            print("  mismatch", doc_id, (n, xent, band), (o["n_bigrams"], o["xent"], o["ppl_band"]))
            break
    check("lm_bigram_quality", ok, f"{len(big_by_doc)} docs")


# --- rolling_fingerprint: loop-based positional rolling hash ---------
def audit_rolling_fp():
    from pdf_using_hugging_face_and_vector_database_spark.functions.hashing import (
        ROLLING_M,
        ROLLING_MAXPOS,
        ROLLING_TOKMOD,
        rolling_coefs,
    )

    coefs = rolling_coefs()

    docs = load("documents")
    got = {}
    for d in docs:
        tk = tokens(d["text"])
        acc = 0
        for i, t in enumerate(tk):
            acc += (md5_int(t) % ROLLING_TOKMOD) * coefs[i % ROLLING_MAXPOS] % ROLLING_M
        got[d["doc_id"]] = (acc % ROLLING_M, len(tk))
    want = {
        r["doc_id"]: (r["rolling_fp"], r["n_tokens"])
        for r in duck("rolling_fingerprint")
    }
    check("rolling_fingerprint", got == want, f"{len(got)} docs")


# --- doc_fingerprints: loop-based 16-bit simhash + md5 prefix --------
def audit_doc_fingerprints():
    docs = load("documents")
    got = {}
    for d in docs:
        tk = tokens(d["text"])
        hs = [md5_int(t) for t in tk]
        sim = 0
        for b in range(16):
            s = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if s > 0:
                sim += 1 << b
        fp48 = int(hashlib.md5(d["text"].encode()).hexdigest()[:12], 16)
        got[d["doc_id"]] = (fp48, sim)
    want = {
        r["doc_id"]: (r["content_fp48"], r["simhash16"])
        for r in duck("doc_fingerprints")
    }
    check("doc_fingerprints", got == want, f"{len(got)} docs")


# --- retention_cohorts: dict-based weekly cohort retention -----------
def audit_retention():
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        RETENTION_ANCHOR,
    )
    import datetime as dt

    anchor = dt.date.fromisoformat(RETENTION_ANCHOR)
    events = load("events")
    days = defaultdict(set)
    for e in events:
        days[e["user_id"]].add((e["ts"].date() - anchor).days)
    cohort = {u: min(ds) // 7 for u, ds in days.items()}
    size = Counter(cohort.values())
    act = defaultdict(set)
    for u, ds in days.items():
        for d in ds:
            act[(cohort[u], d // 7 - cohort[u])].add(u)
    got = {
        k: (len(us), size[k[0]], round(len(us) / size[k[0]], 6))
        for k, us in act.items()
    }
    want = {
        (r["cohort_week"], r["week_offset"]): (
            r["n_active"],
            r["cohort_size"],
            r["retention"],
        )
        for r in duck("retention_cohorts")
    }
    ok = set(got) == set(want) and all(
        got[k][:2] == want[k][:2] and close(got[k][2], want[k][2], 1e-6)
        for k in got
    )
    check("retention_cohorts", ok, f"{len(got)} cohort cells")


# --- hybrid_search_rrf: loop-based tfidf + cosine + RRF fusion -------
def audit_hybrid_rrf():
    from pdf_using_hugging_face_and_vector_database_spark.functions.hashing import (
        det_embed_py,
    )
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        EMBED_DIM,
        HYBRID_K,
        HYBRID_LEG_K,
        QUERY_TEXT,
        RRF_KCONST,
    )

    docs = load("documents")
    n_docs = len(docs)
    df_c = Counter()
    toks_by_doc = {}
    for d in docs:
        tk = tokens(d["text"])
        toks_by_doc[d["doc_id"]] = tk
        df_c.update(set(tk))
    qterms = sorted(set(tokens(QUERY_TEXT)))
    import decimal

    kw_score = {}
    for did, tk in toks_by_doc.items():
        tf = Counter(tk)
        s = decimal.Decimal(0)
        for t in qterms:
            if tf[t]:
                s += decimal.Decimal(
                    str(round(tf[t] * (math.log((n_docs + 1.0) / (df_c[t] + 1.0)) + 1.0), 6))
                )
        if s:
            kw_score[did] = float(s)
    kwl = sorted(kw_score, key=lambda d: (-kw_score[d], d))[:HYBRID_LEG_K]
    kw_rank = {d: i + 1 for i, d in enumerate(kwl)}

    qv = det_embed_py(QUERY_TEXT, EMBED_DIM)

    def cos(a, b):
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    vec_score = {
        d["doc_id"]: round(cos(det_embed_py(d["text"], EMBED_DIM), qv), 6)
        for d in docs
    }
    vl = sorted(vec_score, key=lambda d: (-vec_score[d], d))[:HYBRID_LEG_K]
    vec_rank = {d: i + 1 for i, d in enumerate(vl)}

    fused = {}
    for d in set(kw_rank) | set(vec_rank):
        s = 0.0
        if d in kw_rank:
            s += 1.0 / (RRF_KCONST + kw_rank[d])
        if d in vec_rank:
            s += 1.0 / (RRF_KCONST + vec_rank[d])
        fused[d] = round(s, 6)
    order = sorted(fused, key=lambda d: (-fused[d], d))[:HYBRID_K]
    got = {
        d: (kw_rank.get(d), vec_rank.get(d), fused[d], i + 1)
        for i, d in enumerate(order)
    }
    want = {
        r["doc_id"]: (r["kw_rank"], r["vec_rank"], r["rrf_score"], r["fused_rank"])
        for r in duck("hybrid_search_rrf")
    }
    ok = set(got) == set(want) and all(
        got[k][0] == want[k][0]
        and got[k][1] == want[k][1]
        and close(got[k][2], want[k][2], 1e-6)
        and got[k][3] == want[k][3]
        for k in got
    )
    check("hybrid_search_rrf", ok, f"top {len(got)}")




# --- mixture_sample: dict-based hash buckets + cap + epochs ----------
def audit_mixture():
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        MIX_CAP,
        MIX_DEFAULT_RATE,
        MIX_RATES,
        MIX_REPEATS,
        MIX_SALT,
    )

    docs = load("documents")
    base = []
    for d in docs:
        b = md5_int(f"{MIX_SALT}{d['doc_id']}") % 100
        rate = MIX_RATES.get(d["source"], MIX_DEFAULT_RATE)
        if b < rate:
            base.append((d["source"], b, d["doc_id"]))
    base.sort()
    got = set()
    rank_in_source = Counter()
    for src, b, did in base:
        rank_in_source[src] += 1
        r = rank_in_source[src]
        if r <= MIX_CAP:
            for epoch in range(1, MIX_REPEATS.get(src, 1) + 1):
                got.add((did, src, b, r, epoch))
    want = {
        (r["doc_id"], r["source"], r["sample_bucket"], r["rank_in_source"], r["epoch"])
        for r in duck("mixture_sample")
    }
    check("mixture_sample", got == want, f"{len(got)} rows")


# --- pack_sequences: running-total split-fill ------------------------
def audit_pack():
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        PACK_BUDGET,
        PACK_GROUPS,
    )

    docs = sorted(load("documents"), key=lambda d: d["doc_id"])
    before = Counter()
    got = {}
    for d in docs:
        g = d["doc_id"] % PACK_GROUPS
        n = len(tokens(d["text"]))
        b = before[g]
        got[d["doc_id"]] = (g, n, b // PACK_BUDGET, (b % PACK_BUDGET) + n > PACK_BUDGET)
        before[g] += n
    want = {
        r["doc_id"]: (r["pack_group"], r["n_tokens"], r["pack_id"], r["overflowed"])
        for r in duck("pack_sequences")
    }
    check("pack_sequences", got == want, f"{len(got)} docs")


# --- weighted_sample: Efraimidis-Spirakis draws ----------------------
def audit_weighted_sample():
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        WRS_PER_SOURCE,
    )

    docs = load("documents")
    scored = []
    for d in docs:
        w = len(tokens(d["text"]))
        if w <= 0:
            continue
        u = (md5_int(f"wrs:{d['doc_id']}") + 1) / float((1 << 24) + 1)
        k = round(-math.log(u) / w, 9)
        scored.append((d["source"], k, d["doc_id"], w))
    scored.sort()
    got = set()
    rank = Counter()
    for src, k, did, w in scored:
        rank[src] += 1
        if rank[src] <= WRS_PER_SOURCE:
            got.add((src, did, w, rank[src]))
    want = {
        (r["source"], r["doc_id"], r["weight"], r["rank"])
        for r in duck("weighted_sample")
    }
    check("weighted_sample", got == want, f"{len(got)} rows")


# --- gopher_quality: Counter-based n-gram repetition fractions -------
def audit_gopher():
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        GOPHER_DUP_N,
        GOPHER_MAX_DUP3,
        GOPHER_MAX_TOP2,
        GOPHER_MIN_UNIQUE,
        GOPHER_TOP_N,
    )

    docs = load("documents")
    got = {}
    for d in docs:
        tk = tokens(d["text"])
        n_chars = len(d["text"] or "")
        n_words = len(tk)
        uniq = len(set(tk)) / max(n_words, 1)

        def grams(n):
            if n_words == 0:
                return Counter()
            if n_words < n:
                return Counter({" ".join(tk): 1})
            return Counter(
                " ".join(tk[i : i + n]) for i in range(n_words - n + 1)
            )

        ctop = grams(GOPHER_TOP_N)
        top_chars = max((c * len(g) for g, c in ctop.items()), default=0)
        cdup = grams(GOPHER_DUP_N)
        dup_chars = sum(c * len(g) for g, c in cdup.items() if c >= 2)
        denom = max(n_chars, 1)
        topf = top_chars / denom
        dupf = dup_chars / denom
        got[d["doc_id"]] = (
            n_words,
            round(uniq, 6),
            round(topf, 6),
            round(dupf, 6),
            uniq >= GOPHER_MIN_UNIQUE
            and topf <= GOPHER_MAX_TOP2
            and dupf <= GOPHER_MAX_DUP3,
        )
    want = {
        r["doc_id"]: (
            r["n_words"],
            r["unique_word_frac"],
            r[f"top{GOPHER_TOP_N}gram_char_frac"],
            r[f"dup{GOPHER_DUP_N}gram_char_frac"],
            r["passes_repetition"],
        )
        for r in duck("gopher_quality")
    }
    # 2e-6: the fixture contains EXACT dyadic ties (18/256 chars =
    # 0.0703125) where Python's banker's rounding differs from the
    # engines' HALF_UP by exactly one 6dp ulp — the documented
    # rounding-mode caveat, not a formula divergence (the unrounded
    # fractions and the pass gate match exactly)
    ok = set(got) == set(want) and all(
        got[k][0] == want[k][0]
        and all(close(got[k][i], want[k][i], 2e-6) for i in (1, 2, 3))
        and got[k][4] == want[k][4]
        for k in got
    )
    check("gopher_quality", ok, f"{len(got)} docs")


# --- dsir_select: dict-based hashed-unigram importance weights -------
def audit_dsir():
    import decimal

    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        DSIR_ALPHA,
        DSIR_BUCKETS,
        DSIR_TARGET_SOURCE,
    )

    docs = load("documents")
    raw = Counter()
    tgt = Counter()
    doc_buckets = {}
    for d in docs:
        bs = [md5_int(t) % DSIR_BUCKETS for t in tokens(d["text"])]
        doc_buckets[d["doc_id"]] = bs
        raw.update(bs)
        if d["source"] == DSIR_TARGET_SOURCE:
            tgt.update(bs)
    raw_total = sum(raw.values())
    tgt_total = sum(tgt.values())
    lr = {
        b: round(
            math.log(
                ((tgt[b] + DSIR_ALPHA) / (tgt_total + DSIR_ALPHA * DSIR_BUCKETS))
                / ((raw[b] + DSIR_ALPHA) / (raw_total + DSIR_ALPHA * DSIR_BUCKETS))
            ),
            9,
        )
        for b in raw
    }
    weights = {}
    for did, bs in doc_buckets.items():
        if bs:
            s = sum(decimal.Decimal(str(lr[b])) for b in bs)
            weights[did] = (len(bs), round(float(s) / len(bs), 6))
        else:
            weights[did] = (0, 0.0)
    mean = float(
        sum(decimal.Decimal(str(w)) for _n, w in weights.values())
    ) / len(weights)
    mean = round(mean, 6)
    got = {
        did: (n, w, w > mean) for did, (n, w) in weights.items()
    }
    want = {
        r["doc_id"]: (r["n_grams"], r["dsir_weight"], r["selected"])
        for r in duck("dsir_select")
    }
    ok = set(got) == set(want) and all(
        got[k][0] == want[k][0]
        and close(got[k][1], want[k][1], 2e-6)
        and got[k][2] == want[k][2]
        for k in got
    )
    check("dsir_select", ok, f"{len(got)} docs")


# --- supplier_pagerank: loop-based 5-round rounded power method ------
def audit_pagerank():
    import decimal

    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        PR_DAMPING,
        PR_ITERS,
    )

    orders = {r["o_orderkey"]: r["o_custkey"] for r in load("orders")}
    pairs = set()
    for li in load("lineitem"):
        ck = orders.get(li["l_orderkey"])
        if ck is not None:
            pairs.add((f"c{ck}", f"s{li['l_suppkey']}"))
    edges = set()
    for a, b in pairs:
        edges.add((a, b))
        edges.add((b, a))
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    out_deg = Counter(src for src, _dst in edges)
    rank = {nd: round(1.0 / n, 9) for nd in nodes}
    tn = 1.0 - PR_DAMPING
    for _ in range(PR_ITERS):
        inflow = defaultdict(decimal.Decimal)
        for src, dst in edges:
            inflow[dst] += decimal.Decimal(
                str(round(rank[src] / out_deg[src], 9))
            )
        rank = {
            nd: round(tn / n + PR_DAMPING * float(inflow.get(nd, 0)), 9)
            for nd in nodes
        }
    got = {nd: round(r, 6) for nd, r in rank.items()}
    want = {r["node"]: r["rank"] for r in duck("supplier_pagerank")}
    ok = set(got) == set(want) and all(
        close(got[k], want[k], 2e-6) for k in got
    )
    check("supplier_pagerank", ok, f"{n} nodes, {len(edges)} edges")


# --- dataset_split: md5 bucket + cumulative cuts ---------------------
def audit_split():
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        SPLIT_BUCKETS,
        SPLIT_FRACTIONS,
    )

    names = list(SPLIT_FRACTIONS)
    cuts = []
    cum = 0.0
    for n in names[:-1]:
        cum += SPLIT_FRACTIONS[n]
        cuts.append((n, int(cum * SPLIT_BUCKETS + 1e-9)))
    got = {}
    for d in load("documents"):
        b = md5_int(f"split:{d['doc_id']}") % SPLIT_BUCKETS
        split = names[-1]
        for n, c in cuts:
            if b < c:
                split = n
                break
        got[d["doc_id"]] = (d["source"], b, split)
    want = {
        r["doc_id"]: (r["source"], r["bucket"], r["split"])
        for r in duck("dataset_split")
    }
    check("dataset_split", got == want, f"{len(got)} docs")


# --- crossdoc_spans: gram -> distinct-doc counts ---------------------
def audit_crossdoc():
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        CROSSDOC_FLAG_FRAC,
        CROSSDOC_MIN_DOCS,
        CROSSDOC_NGRAM,
    )

    docs = load("documents")
    occ = Counter()   # (doc, gram) -> n
    gram_docs = defaultdict(set)
    for d in docs:
        tk = tokens(d["text"])
        n = len(tk)
        if n == 0:
            grams = []
        elif n < CROSSDOC_NGRAM:
            grams = [" ".join(tk)]
        else:
            grams = [
                " ".join(tk[i : i + CROSSDOC_NGRAM])
                for i in range(n - CROSSDOC_NGRAM + 1)
            ]
        grams = [g for g in grams if g != ""]
        for g in grams:
            occ[(d["doc_id"], g)] += 1
            gram_docs[g].add(d["doc_id"])
    per = defaultdict(lambda: [0, 0])  # doc -> [n_grams, dup_grams]
    for (did, g), n in occ.items():
        per[did][0] += n
        if len(gram_docs[g]) >= CROSSDOC_MIN_DOCS:
            per[did][1] += n
    got = {
        did: (
            ng,
            dg,
            round(dg / ng, 6),
            (dg / ng) >= CROSSDOC_FLAG_FRAC,
        )
        for did, (ng, dg) in per.items()
    }
    want = {
        r["doc_id"]: (
            r["n_grams"],
            r["dup_grams"],
            r["dup_span_frac"],
            r["is_boilerplate"],
        )
        for r in duck("crossdoc_spans")
    }
    ok = set(got) == set(want) and all(
        got[k][:2] == want[k][:2]
        and close(got[k][2], want[k][2], 2e-6)
        and got[k][3] == want[k][3]
        for k in got
    )
    check("crossdoc_spans", ok, f"{len(got)} docs")


# --- segment_dedup: global keep-first segment rewrite ----------------
def audit_segment_dedup():
    from pdf_using_hugging_face_and_vector_database_spark.queries import SEG_N

    docs = sorted(load("documents"), key=lambda d: d["doc_id"])
    seen = set()
    got = {}
    for d in docs:
        tk = tokens(d["text"])
        n_seg = max((len(tk) + SEG_N - 1) // SEG_N, 1)
        kept_texts = []
        kept = 0
        for i in range(n_seg):
            seg = " ".join(tk[i * SEG_N : (i + 1) * SEG_N])
            if seg not in seen:
                seen.add(seg)
                kept += 1
                kept_texts.append(seg)
        clean = " ".join(kept_texts)
        got[d["doc_id"]] = (
            n_seg,
            kept,
            hashlib.md5(clean.encode()).hexdigest(),
            len(clean),
        )
    want = {
        r["doc_id"]: (r["n_segments"], r["kept_segments"], r["clean_md5"], r["clean_chars"])
        for r in duck("segment_dedup")
    }
    check("segment_dedup", got == want, f"{len(got)} docs")


# --- minhash_signatures: loop-based char-shingle MinHash -------------
def audit_minhash():
    from pdf_using_hugging_face_and_vector_database_spark.functions.hashing import (
        P_MINHASH,
        minhash_params,
    )
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        MINHASH_HASHES,
        NGRAM,
    )

    params = minhash_params(MINHASH_HASHES)
    got = {}
    for d in load("documents"):
        t = d["text"]
        if len(t) < NGRAM:
            shingles = [t]
        else:
            shingles = [t[i : i + NGRAM] for i in range(len(t) - NGRAM + 1)]
        hs = [md5_int(sh) for sh in shingles]
        got[d["doc_id"]] = tuple(
            min((h * a + b) % P_MINHASH for h in hs) for a, b in params
        )
    want = {
        r["doc_id"]: tuple(
            r[f"mh{k:02d}"] for k in range(MINHASH_HASHES)
        )
        for r in duck("minhash_signatures")
    }
    check("minhash_signatures", got == want, f"{len(got)} docs")


# --- bpe_merges / bpe_encode: loop-based merge induction + apply -----
def _bpe_learn_and_apply():
    from pdf_using_hugging_face_and_vector_database_spark.operators.text_analysis import (
        BPE_EOW,
    )
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        BPE_N_MERGES,
    )

    docs = load("documents")
    doc_words = {}
    hist = Counter()
    for d in docs:
        ws = [
            t.replace("[", "").replace("]", "")
            for t in (d["text"] or "").split(" ")
        ]
        ws = [w for w in ws if w]
        doc_words[d["doc_id"]] = ws
        hist.update(ws)
    # seq as a list of symbols: chars + EOW
    seqs = {w: [*w, BPE_EOW] for w in hist}
    merges = []
    for _ in range(BPE_N_MERGES):
        pc = Counter()
        for w, syms in seqs.items():
            cnt = hist[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += cnt
        (lhs, rhs), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((lhs, rhs, n))
        # left-to-right non-overlapping merge (== the bracket replace)
        for w, syms in seqs.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == lhs
                    and syms[i + 1] == rhs
                ):
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return doc_words, hist, seqs, merges


def audit_bpe_merges():
    _dw, _h, _s, merges = _bpe_learn_and_apply()
    got = {
        r + 1: (lhs, rhs, lhs + rhs, n)
        for r, (lhs, rhs, n) in enumerate(merges)
    }
    want = {
        r["merge_rank"]: (r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in duck("bpe_merges")
    }
    check("bpe_merges", got == want, f"{len(got)} merges: {list(got.values())}")


def audit_bpe_encode():
    doc_words, _hist, seqs, _merges = _bpe_learn_and_apply()
    got = {}
    for did, ws in doc_words.items():
        if not ws:
            continue
        n_tok = sum(len(seqs[w]) for w in ws)
        n_base = sum(len(w) + 1 for w in ws)
        got[did] = (len(ws), n_tok, n_base, round(n_base / n_tok, 6))
    want = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["n_base_symbols"], r["compression"])
        for r in duck("bpe_encode")
    }
    ok = set(got) == set(want) and all(
        got[k][:3] == want[k][:3] and close(got[k][3], want[k][3], 2e-6)
        for k in got
    )
    check("bpe_encode", ok, f"{len(got)} docs")


# --- impute_event_values: python interpolated median + repair --------
def audit_impute():
    import decimal

    events = load("events")
    holed = defaultdict(list)
    rows = []
    for e in events:
        v = None if e["event_id"] % 9 == 0 else e["value"]
        rows.append((e["event_type"], v))
        if v is not None:
            holed[e["event_type"]].append(v)

    def interp_median(vals):
        vs = sorted(vals)
        n = len(vs)
        mid = (n - 1) / 2.0
        lo = vs[int(mid)]
        hi = vs[int(mid + 0.5)]
        return round(lo + (hi - lo) * (mid - int(mid)), 6)

    med = {t: interp_median(vs) for t, vs in holed.items()}
    agg = defaultdict(lambda: [0, 0, decimal.Decimal(0), decimal.Decimal(0)])
    for t, v in rows:
        a = agg[t]
        a[0] += 1
        if v is None:
            a[1] += 1
            a[3] += decimal.Decimal(str(med[t]))
        else:
            a[2] += decimal.Decimal(str(v))
            a[3] += decimal.Decimal(str(v))
    got = {
        t: (a[0], a[1], med[t], float(a[2]), float(a[3]))
        for t, a in agg.items()
    }
    want = {
        r["event_type"]: (
            r["n_rows"], r["n_imputed"], r["imputation_value"],
            r["sum_before"], r["sum_after"],
        )
        for r in duck("impute_event_values")
    }
    ok = set(got) == set(want) and all(
        got[k][:2] == want[k][:2]
        and close(got[k][2], want[k][2], 2e-6)
        and close(got[k][3], want[k][3], 1e-6)
        and close(got[k][4], want[k][4], 1e-6)
        for k in got
    )
    check("impute_event_values", ok, f"{len(got)} event types")


# --- value_histogram: python ntile under the same total order --------
def audit_value_histogram():
    import decimal

    from pdf_using_hugging_face_and_vector_database_spark.queries import HIST_BINS

    events = sorted(load("events"), key=lambda e: (e["value"], e["event_id"]))
    n = len(events)
    base, extra = divmod(n, HIST_BINS)
    got = {}
    idx = 0
    for b in range(1, HIST_BINS + 1):
        size = base + (1 if b <= extra else 0)
        chunk = events[idx : idx + size]
        idx += size
        vals = [e["value"] for e in chunk]
        got[b] = (
            len(chunk),
            round(min(vals), 6),
            round(max(vals), 6),
            float(sum(decimal.Decimal(str(v)) for v in vals)),
        )
    want = {
        r["bin"]: (r["n"], r["lo"], r["hi"], r["sum_value"])
        for r in duck("value_histogram")
    }
    ok = set(got) == set(want) and all(
        got[k][0] == want[k][0]
        and close(got[k][1], want[k][1], 2e-6)
        and close(got[k][2], want[k][2], 2e-6)
        and close(got[k][3], want[k][3], 1e-6)
        for k in got
    )
    check("value_histogram", ok, f"{n} rows over {HIST_BINS} bins")


# ====================== wave 2 (round 13) ===========================
# The r12 verdict's remaining replay-heavy rows: the quantization
# twins, the SimHash signature arithmetic, and the streaming
# batch-twin digests.


def _round_half_away(y: float) -> float:
    """Half-away-from-zero round to integer — the engines' contract
    (Spark BigDecimal HALF_UP on doubles, DuckDB round()); Python's
    built-in round is banker's and must not be used here."""
    return math.floor(y + 0.5) if y >= 0 else math.ceil(y - 0.5)


def _int8_codes(vec):
    """Per-vector symmetric int8 quantization: scale = max|x|/127
    (floored at 1e-12), codes = clamp(round(x/scale), -127, 127)."""
    v = [float(x) for x in vec]
    scale = max(max(abs(x) for x in v), 1e-12) / 127.0
    codes = [
        int(min(max(_round_half_away(x / scale), -127.0), 127.0)) for x in v
    ]
    return v, scale, codes


def _fold_dot(a, b):
    """Sequential left-to-right IEEE double fold — the engines' explicit
    range()-based sum order."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def audit_embed_quantize():
    got = {}
    for e in load("embeddings"):
        v, scale, codes = _int8_codes(e["embedding"])
        err = max(abs(x - c * scale) for x, c in zip(v, codes))
        got[e["vec_id"]] = (
            round(scale, 9),
            sum(codes),
            min(codes),
            max(codes),
            round(err, 9),
        )
    want = {
        r["vec_id"]: (r["scale"], r["q_sum"], r["q_min"], r["q_max"], r["max_abs_err"])
        for r in duck("embed_quantize")
    }
    ok = set(got) == set(want) and all(
        close(got[k][0], want[k][0], 2e-9)
        and got[k][1:4] == tuple(want[k][1:4])
        and close(got[k][4], want[k][4], 2e-9)
        for k in got
    )
    check("embed_quantize", ok, f"{len(got)} vectors")


def audit_quantized_rerank():
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        ANN_RERANK_CAND,
    )

    rows = []
    qv = qcodes = None
    for e in load("embeddings"):
        v, _scale, codes = _int8_codes(e["embedding"])
        rows.append((e["vec_id"], e["label"], v, codes))
        if e["vec_id"] == 0:
            qv, qcodes = v, codes
    scored = [
        (vid, lab, v, sum(c * qc for c, qc in zip(codes, qcodes)))
        for vid, lab, v, codes in rows
    ]
    scored.sort(key=lambda t: (-t[3], t[0]))
    cands = scored[:ANN_RERANK_CAND]
    qq = math.sqrt(_fold_dot(qv, qv))
    rer = [
        (vid, lab, qd, _fold_dot(v, qv) / (math.sqrt(_fold_dot(v, v)) * qq))
        for vid, lab, v, qd in cands
    ]
    rer.sort(key=lambda t: (-t[3], t[0]))
    got = [(vid, lab, qd, round(s, 6)) for vid, lab, qd, s in rer[:10]]
    want = [
        (r["vec_id"], r["label"], r["q_dot"], r["score"])
        for r in duck("q3_ann_quantized_rerank")
    ]
    ok = len(got) == len(want) and all(
        g[:3] == tuple(w[:3]) and close(g[3], w[3], 2e-6)
        for g, w in zip(got, want)
    )
    check("q3_ann_quantized_rerank", ok, f"top-{len(got)} of {len(cands)} cands")


def audit_simhash_hamming():
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        NEARDUP_TRUNC,
        SIMHASH_BITS,
        SIMHASH_CHUNKS,
        SIMHASH_MAXH,
    )

    nhex = max(6, (SIMHASH_BITS + 3) // 4)
    docs = load("documents")
    corpus = [(d["doc_id"], d["text"]) for d in docs] + [
        (d["doc_id"] + 100000, d["text"][: len(d["text"]) - NEARDUP_TRUNC])
        for d in docs
    ]
    hash_cache: dict[str, int] = {}
    fps = {}
    for did, text in corpus:
        cnt = [0] * SIMHASH_BITS
        for tok, c in Counter(tokens(text)).items():
            h = hash_cache.get(tok)
            if h is None:
                h = hash_cache[tok] = md5_int(tok, nhex)
            for b in range(SIMHASH_BITS):
                cnt[b] += c if (h >> b) & 1 else -c
        fp = 0
        for b in range(SIMHASH_BITS):
            if cnt[b] > 0:
                fp |= 1 << b
        fps[did] = fp
    width = SIMHASH_BITS // SIMHASH_CHUNKS
    mask = (1 << width) - 1
    buckets = defaultdict(list)
    for did, fp in fps.items():
        for c in range(SIMHASH_CHUNKS):
            buckets[(c, (fp >> (c * width)) & mask)].append(did)
    got = {}
    for ids in buckets.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b2 in ids[i + 1 :]:
                if (a, b2) not in got:
                    h = bin(fps[a] ^ fps[b2]).count("1")
                    if h <= SIMHASH_MAXH:
                        got[(a, b2)] = h
    got = {k: v for k, v in got.items() if v <= SIMHASH_MAXH}
    want = {(r["id_a"], r["id_b"]): r["hamming"] for r in duck("neardup_simhash")}
    check("neardup_simhash", got == want, f"{len(got)} pairs <= H{SIMHASH_MAXH}")


def audit_stream_events_hourly():
    import decimal

    got = defaultdict(lambda: [0, decimal.Decimal(0)])
    for e in load("events"):
        ws = e["ts"].replace(minute=0, second=0, microsecond=0)
        k = (ws.strftime("%Y-%m-%d %H:%M:%S"), e["event_type"])
        got[k][0] += 1
        got[k][1] += decimal.Decimal(str(e["value"]))
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in duck("stream_events_hourly")
    }
    ok = set(got) == set(want) and all(
        got[k][0] == want[k][0] and close(float(got[k][1]), want[k][1], 1e-6)
        for k in got
    )
    check("stream_events_hourly", ok, f"{len(got)} (hour, type) windows")


def audit_stream_session_windows():
    import datetime as dt
    import decimal

    gap = dt.timedelta(minutes=30)
    per_user = defaultdict(list)
    for e in load("events"):
        per_user[e["user_id"]].append((e["ts"], e["value"]))
    got = {}
    for u, evs in per_user.items():
        evs.sort(key=lambda t: t[0])
        cur = None
        for ts, val in evs:
            # session-window contract: a gap of EXACTLY 30 min starts a
            # NEW session (>=; the explicit-lag sessionizer uses >)
            if cur is None or ts - cur[1] >= gap:
                if cur is not None:
                    got[(u, cur[0].strftime("%Y-%m-%d %H:%M:%S"))] = cur[2:]
                cur = [ts, ts, None, 0, decimal.Decimal(0)]
            cur[1] = ts
            cur[2] = (cur[1] + gap).strftime("%Y-%m-%d %H:%M:%S")
            cur[3] += 1
            cur[4] += decimal.Decimal(str(val))
        if cur is not None:
            got[(u, cur[0].strftime("%Y-%m-%d %H:%M:%S"))] = cur[2:]
    want = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["total_value"],
        )
        for r in duck("stream_session_windows")
    }
    ok = set(got) == set(want) and all(
        got[k][0] == want[k][0]
        and got[k][1] == want[k][1]
        and close(float(got[k][2]), want[k][2], 1e-6)
        for k in got
    )
    check("stream_session_windows", ok, f"{len(got)} sessions")


def audit_stream_dedup_keys():
    got = {(e["user_id"], e["event_type"]) for e in load("events")}
    want = {(r["user_id"], r["event_type"]) for r in duck("stream_dedup_keys")}
    check("stream_dedup_keys", got == want, f"{len(got)} distinct keys")


def audit_hostile_text():
    """The r13 hostile-shape row, re-derived with Python's own string
    machinery — code-point slicing, the sre regex engine (a third
    engine beside Java regex and RE2, exactly where multibyte/emoji
    semantics could diverge), and str.count on the doubled-space
    padding."""
    import re

    from pdf_using_hugging_face_and_vector_database_spark.functions.text import (
        BPE_TOKEN_RE,
        LANG_MARKERS,
    )
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        HOSTILE_DOCS,
        HOSTILE_PREFIX_CHARS,
        HOSTILE_TEMPLATES,
    )

    def md5_hex(s):
        return hashlib.md5(s.encode("utf-8")).hexdigest()

    bpe_re = re.compile(BPE_TOKEN_RE)
    got = {}
    for d in load("documents"):
        if d["doc_id"] >= HOSTILE_DOCS:
            continue
        text = (
            d["text"][:HOSTILE_PREFIX_CHARS]
            + " "
            + HOSTILE_TEMPLATES[d["doc_id"] % len(HOSTILE_TEMPLATES)]
        )
        toks = tokens(text)
        padded = " " + text.replace(" ", "  ") + " "
        hits = {
            lang: sum(padded.count(f" {w} ") for w in ws)
            for lang, ws in LANG_MARKERS.items()
        }
        stripped = text
        for ch in ".,;:!?":
            stripped = stripped.replace(ch, "")
        pr = (len(text) - len(stripped)) / max(len(text), 1)
        char3 = (
            [text]
            if len(text) < 3
            else [text[i : i + 3] for i in range(len(text) - 2)]
        )
        n2 = max(len(toks) - 1, 1)
        grams2 = [" ".join(toks[i - 1 : i + 1]) for i in range(1, n2 + 1)]
        got[d["doc_id"]] = (
            len(toks),
            md5_hex("|".join(toks)),
            len(bpe_re.findall(text)),
            hits["en"],
            hits["de"],
            round(pr, 6),
            len(char3),
            md5_hex("|".join(char3)),
            md5_hex("|".join(grams2)),
        )
    want = {
        r["doc_id"]: (
            r["n_tok"],
            r["tok_digest"],
            r["n_bpe"],
            r["hits_en"],
            r["hits_de"],
            r["punct_r"],
            r["n_char3"],
            r["char3_digest"],
            r["gram2_digest"],
        )
        for r in duck("hostile_text_tokens")
    }
    ok = set(got) == set(want) and all(
        got[k][:5] == tuple(want[k][:5])
        and close(got[k][5], want[k][5], 2e-6)
        and got[k][6:] == tuple(want[k][6:])
        for k in got
    )
    check("hostile_text_tokens", ok, f"{len(got)} augmented docs")


def audit_binary_rerank():
    """Sign-bit (32x-compressed) prefilter + exact re-rank: pack
    x>0 bits into 32-bit words, Hamming via xor popcount, cut at
    BIN_CAND by (hamming, id), exact sequential-fold cosine top-10."""
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        BIN_CAND,
        BIN_QUERY_ID,
    )

    rows = []
    qwords = qv = None
    for e in load("embeddings"):
        v = [float(x) for x in e["embedding"]]
        words = []
        for j in range(len(v) // 32):
            w = 0
            for i in range(32):
                if v[j * 32 + i] > 0:
                    w |= 1 << i
            words.append(w)
        rows.append((e["vec_id"], e["label"], v, words))
        if e["vec_id"] == BIN_QUERY_ID:
            qwords, qv = words, v
    scored = [
        (
            vid,
            lab,
            v,
            sum(bin(w ^ qw).count("1") for w, qw in zip(words, qwords)),
        )
        for vid, lab, v, words in rows
    ]
    scored.sort(key=lambda t: (t[3], t[0]))
    cands = scored[:BIN_CAND]
    qq = math.sqrt(_fold_dot(qv, qv))
    rer = [
        (vid, lab, ham, _fold_dot(v, qv) / (math.sqrt(_fold_dot(v, v)) * qq))
        for vid, lab, v, ham in cands
    ]
    rer.sort(key=lambda t: (-t[3], t[0]))
    got = [(vid, lab, ham, round(s, 6)) for vid, lab, ham, s in rer[:10]]
    want = [
        (r["vec_id"], r["label"], r["hamming"], r["score"])
        for r in duck("q3_ann_binary_rerank")
    ]
    ok = len(got) == len(want) and all(
        g[:3] == tuple(w[:3]) and close(g[3], w[3], 2e-6)
        for g, w in zip(got, want)
    )
    check("q3_ann_binary_rerank", ok, f"top-{len(got)} of {len(cands)} cands")


def audit_rolling_distinct_users():
    import datetime as dt

    epoch0 = dt.datetime(1970, 1, 1)
    daily = set()
    for e in load("events"):
        day = int(math.floor((e["ts"] - epoch0).total_seconds())) // 86400
        daily.add((e["event_type"], day, e["user_id"]))
    by_et = defaultdict(set)
    for et, day, u in daily:
        by_et[et].add((day, u))
    got = {}
    for et, pairs in by_et.items():
        days = {d for d, _u in pairs}
        for d in days:
            users = {u for dd, u in pairs if d - 2 <= dd <= d}
            got[(et, d)] = len(users)
    want = {
        (r["event_type"], r["day"]): r["distinct_users_3d"]
        for r in duck("rolling_distinct_users")
    }
    check("rolling_distinct_users", got == want, f"{len(got)} (type, day) rows")


# --- empty_relation_contracts: derive the 0-row contracts mechanically
def audit_empty_contracts():
    """ONE row with count 0 / NULL sum for a global aggregate vs ZERO
    rows for grouped/session/window aggregation — derived from plain
    list/dict mechanics over the (measured-empty) negative-key subsets,
    not hardcoded."""
    docs = [d for d in load("documents") if d["doc_id"] < 0]
    events = [e for e in load("events") if e["user_id"] < 0]

    def grams2(text):
        tk = tokens(text)
        return list(zip(tk, tk[1:]))

    grouped = defaultdict(int)
    for e in events:
        grouped[e["event_type"]] += 1
    sessions = defaultdict(list)
    for e in events:
        sessions[e["user_id"]].append(e["ts"])
    vals = [e["value"] for e in events if e["value"] is not None]
    total = sum(vals) if vals else None
    got = {
        "doc_stats": (len(docs), "<none>"),
        "language_id": (len(docs), "<none>"),
        "gram_explode": (sum(len(grams2(d["text"])) for d in docs), "<none>"),
        "grouped_agg": (len(grouped), "<none>"),
        "session_groups": (len(sessions), "<none>"),
        # a window function emits one row per input row
        "window_fn": (len(events), "<none>"),
        "join_back": (len(docs), "<none>"),
        # the global-aggregate contract: ALWAYS exactly one row
        "global_agg": (len(events), "<null>" if total is None else str(total)),
    }
    want = {
        r["kernel"]: (r["n_rows"], r["probe"])
        for r in duck("empty_relation_contracts")
    }
    check("empty_relation_contracts", got == want, f"{len(got)} contracts")


# --- null_keys_contracts: NULL-key semantics from list/dict mechanics -
def audit_null_keys():
    """Python's None-aware sorts/dicts are a genuinely third
    implementation of the NULL contracts the r14 row pins: placement
    is expressed as an explicit sort-key tuple (not an engine
    default), IS DISTINCT FROM as an is-None-aware comparison, the
    NULL join key as an explicit dict probe, the NULL as-of probe as
    a no-match branch."""
    import datetime as dt

    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        NULLKEY_CLASS,
        NULLKEY_NULL_TAG,
        NULLKEY_TS_MOD,
    )

    events = load("events")
    ev = [
        {
            "event_id": e["event_id"],
            "user_id": e["user_id"],
            "ts": e["ts"],
            "k": None if e["event_type"] == NULLKEY_CLASS else e["event_type"],
            "event_type": e["event_type"],
        }
        for e in events
    ]
    TAG = NULLKEY_NULL_TAG
    per_user = defaultdict(list)
    for e in ev:
        per_user[e["user_id"]].append(e)

    got = {}

    def rank_leg(name, order):
        dig = 0
        nulls = 0
        for u, rows in per_user.items():
            for rn, r in enumerate(order(rows), start=1):
                k = r["k"] if r["k"] is not None else TAG
                dig += md5_int(f"{u}:{rn}:{k}")
                if r["k"] is None:
                    nulls += 1
        got[name] = (len(ev), dig, nulls)

    # ASC NULLS LAST: non-null ascending, NULLs after everything
    rank_leg(
        "window_rank_asc",
        lambda rows: sorted(
            rows,
            key=lambda r: (r["k"] is None, r["k"] or "", r["event_id"]),
        ),
    )

    # DESC NULLS FIRST: stable two-pass — event_id asc, then k desc
    # with NULLs pushed to the front
    def desc_nulls_first(rows):
        by_id = sorted(rows, key=lambda r: r["event_id"])
        nulls = [r for r in by_id if r["k"] is None]
        nonnull = sorted(
            (r for r in by_id if r["k"] is not None),
            key=lambda r: r["k"],
            reverse=True,
        )
        return nulls + nonnull

    rank_leg("window_rank_desc", desc_nulls_first)

    cnt = defaultdict(int)
    for e in ev:
        cnt[e["k"]] += 1
    got["grouped_nulls"] = (
        len(cnt),
        sum(
            md5_int(f"{k if k is not None else TAG}:{c}")
            for k, c in cnt.items()
        ),
        cnt.get(None, 0),
    )

    n_null = cnt.get(None, 0)
    got["join_drop"] = (
        len(ev) - n_null,
        sum(
            md5_int(f"{e['event_id']}:{cnt[e['k']]}")
            for e in ev
            if e["k"] is not None
        ),
        n_null,
    )
    got["join_null_safe"] = (
        len(ev),
        sum(md5_int(f"{e['event_id']}:{cnt[e['k']]}") for e in ev),
        n_null,
    )

    def is_distinct(a, b):
        if (a is None) != (b is None):
            return True
        return a is not None and a != b

    n_chg = dig = nulls = 0
    for u, rows in per_user.items():
        prev = None
        for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
            if is_distinct(r["k"], prev):
                n_chg += 1
                dig += md5_int(f"{u}:{r['event_id']}")
                if r["k"] is None or prev is None:
                    nulls += 1
            prev = r["k"]
    got["change_detect"] = (n_chg, dig, nulls)

    clicks = defaultdict(list)
    for e in ev:
        if e["event_type"] == NULLKEY_CLASS:
            clicks[e["user_id"]].append(e["ts"])
    us = dt.timedelta(microseconds=1)
    epoch0 = dt.datetime(1970, 1, 1)
    n_p = dig = nulls = 0
    for e in ev:
        if e["event_type"] != "purchase":
            continue
        n_p += 1
        tsk = None if e["event_id"] % NULLKEY_TS_MOD == 0 else e["ts"]
        if tsk is None:
            nulls += 1
            match = None  # a NULL probe time matches nothing
        else:
            at_or_before = [c for c in clicks[e["user_id"]] if c <= tsk]
            match = max(at_or_before) if at_or_before else None
        m = (match - epoch0) // us if match is not None else None
        dig += md5_int(f"{e['event_id']}:{m if m is not None else TAG}")
    got["asof_null_key"] = (n_p, dig, nulls)

    want = {
        r["kernel"]: (r["n_rows"], r["digest"], r["nulls_touched"])
        for r in duck("null_keys_contracts")
    }
    check(
        "null_keys_contracts",
        got == want,
        f"{sum(v[0] for v in got.values())} leg rows, "
        f"{got['grouped_nulls'][2]} null keys",
    )


# --- float_edge_contracts: special-float semantics from explicit
# Python branches (IEEE Python disagrees with SQL on NaN equality and
# sorting, so the contracts are expressed as explicit key functions —
# a genuinely third formulation, not a replay)
def audit_float_edges():
    import math as _m

    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        FLOATEDGE_MOD,
    )

    nan, inf = float("nan"), float("inf")
    specials = [nan, inf, -inf, -0.0, 0.0]
    events = load("events")
    rows = []
    for e in events:
        k = e["event_id"] % FLOATEDGE_MOD
        rows.append(
            {
                "event_id": e["event_id"],
                "user_id": e["user_id"],
                "event_type": e["event_type"],
                "x": specials[k] if k <= 4 else float(e["value"]),
            }
        )

    def cls(v):
        if _m.isnan(v):
            return "nan"
        if v == inf:
            return "inf"
        if v == -inf:
            return "-inf"
        return "fin"

    def key(v):
        # the engines' SQL total order and key folding made explicit:
        # NaN is ONE key sorting greatest; -0.0 + 0.0 folds the zeros
        return (1, 0.0) if _m.isnan(v) else (0, v + 0.0)

    got = {}
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append(r)
    dig = nspec = 0
    for u, rs in per_user.items():
        for rn, r in enumerate(
            sorted(rs, key=lambda r: (key(r["x"]), r["event_id"])), start=1
        ):
            dig += md5_int(f"{u}:{rn}:{cls(r['x'])}")
            if cls(r["x"]) != "fin":
                nspec += 1
    got["rank_total_order"] = (len(rows), dig, nspec)

    cnt = defaultdict(int)
    rep = {}
    for r in rows:
        cnt[key(r["x"])] += 1
        rep[key(r["x"])] = r["x"]
    got["group_fold"] = (
        len(cnt),
        sum(md5_int(f"{cls(rep[k])}:{c}") for k, c in cnt.items()),
        sum(c for k, c in cnt.items() if cls(rep[k]) != "fin"),
    )

    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r["x"])
    dig = nspec = 0
    for t, xs in by_type.items():
        s = 0.0
        for v in xs:
            s += v
        a = s / len(xs)
        mx = max(xs, key=key)
        mn = min(xs, key=key)
        dig += md5_int(f"{t}:{cls(s)}:{cls(a)}:{cls(mx)}:{cls(mn)}")
        if _m.isnan(s):
            nspec += 1
    got["agg_propagation"] = (len(by_type), dig, nspec)

    dim = {key(r["x"]) for r in rows if r["event_id"] % FLOATEDGE_MOD <= 4}
    joined = [r for r in rows if key(r["x"]) in dim]
    got["join_special_keys"] = (
        len(joined),
        sum(md5_int(f"{r['event_id']}:{cls(r['x'])}") for r in joined),
        sum(1 for r in joined if cls(r["x"]) != "fin"),
    )

    dig = nspec = 0
    for r in rows:
        den = r["x"] - r["x"]
        if den == 0.0:
            qc = "null"  # divide-by-exact-zero -> NULL in both engines
        else:
            qc = "nan" if _m.isnan(r["x"] / den) else "other"
            nspec += 1 if qc == "nan" else 0
        dig += md5_int(f"{r['event_id']}:{qc}")
    got["div_zero_null"] = (len(rows), dig, nspec)

    want = {
        r["kernel"]: (r["n_rows"], r["digest"], r["specials_touched"])
        for r in duck("float_edge_contracts")
    }
    check(
        "float_edge_contracts",
        got == want,
        f"{got['rank_total_order'][2]} special rows, "
        f"{got['group_fold'][0]} fold keys",
    )


# --- overflow_precision_contracts: numeric boundary semantics from
# Python's UNBOUNDED integers (a genuinely third formulation: where
# Spark needs try_* kernels and DuckDB needs HUGEINT, Python computes
# every sum/product exactly and applies the BIGINT range as an
# explicit check; the tie contract uses explicit ROUND_HALF_UP because
# Python's default rounding is banker's — the divergence the pin
# measures)
def audit_overflow():
    import decimal as _dec

    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        OVFL_BIGMAX,
        OVFL_CLASS_MOD,
        OVFL_GROUP_CUT,
        OVFL_GROUP_MOD,
        OVFL_JITTER_MOD,
        OVFL_NULL_TAG,
    )

    LO, HI = -OVFL_BIGMAX - 1, OVFL_BIGMAX
    TAG = OVFL_NULL_TAG
    events = load("events")
    rows = []
    for e in events:
        eid = e["event_id"]
        is_pos = eid % OVFL_CLASS_MOD == 0 and eid % OVFL_GROUP_MOD < OVFL_GROUP_CUT
        is_neg = eid % OVFL_CLASS_MOD == 1
        is_dbl = eid % OVFL_CLASS_MOD == 2
        benign = eid * 1000 + 7
        rows.append(
            {
                "eid": eid,
                "etype": e["event_type"],
                "big_pos": OVFL_BIGMAX - eid % OVFL_JITTER_MOD if is_pos else benign,
                "big_mix": (
                    OVFL_BIGMAX - eid % OVFL_JITTER_MOD
                    if is_pos
                    else (-OVFL_BIGMAX + eid % OVFL_JITTER_MOD if is_neg else benign)
                ),
                "in_int_range": not is_dbl,  # 1e10+eid is out of INT32
                # quarter-units keep the k/4 fractions exact in ints
                "q4": (eid - 500) * 4 + eid % 4,
                "dec": _dec.Decimal(f"{eid % 2000 - 1000}.{eid % 100:02d}50"),
                "is_pos": is_pos,
                "is_neg": is_neg,
                "is_dbl": is_dbl,
                "is_tie": eid % 4 == 2,
            }
        )
    got = {}

    by_type = defaultdict(list)
    for r in rows:
        by_type[r["etype"]].append(r)
    dig = nb = 0
    for t, rs in by_type.items():
        s_exact = sum(r["big_mix"] for r in rs)  # unbounded int: exact
        dig += md5_int(f"{t}:{s_exact}")
        nb += sum(1 for r in rs if r["is_pos"] or r["is_neg"])
    got["sum_decimal_route"] = (len(by_type), dig, nb)

    by_g = defaultdict(list)
    for r in rows:
        by_g[r["eid"] % OVFL_GROUP_MOD].append(r)
    dig = nb = 0
    for g, rs in by_g.items():
        s_exact = sum(r["big_pos"] for r in rs)
        t = s_exact if LO <= s_exact <= HI else None
        dig += md5_int(f"{g}:{t if t is not None else TAG}")
        nb += sum(1 for r in rs if r["is_pos"])
    got["try_sum_null_on_overflow"] = (len(by_g), dig, nb)

    dig = dig2 = nb = 0
    for r in rows:
        p = r["big_pos"] * 3  # exact
        m = p if LO <= p <= HI else None
        dig += md5_int(f"{r['eid']}:{m if m is not None else TAG}")
        dig2 += md5_int(f"{r['eid']}:{p}")
        nb += 1 if m is None else 0
    got["mul_try_null"] = (len(rows), dig, nb)
    got["mul_decimal_exact"] = (
        len(rows),
        dig2,
        sum(1 for r in rows if r["is_pos"]),
    )

    dig = nb = 0
    for r in rows:
        c = r["eid"] if r["in_int_range"] else None
        dig += md5_int(f"{r['eid']}:{c if c is not None else TAG}")
        nb += 1 if c is None else 0
    got["cast_range_null"] = (len(rows), dig, nb)

    dig = nb = 0
    for r in rows:
        q = r["q4"]
        # round half away from zero on quarter-units
        rr = (q + 2) // 4 if q >= 0 else -((-q + 2) // 4)
        # truncate toward zero
        tt = q // 4 if q >= 0 else -((-q) // 4)
        dig += md5_int(f"{r['eid']}:{rr}:{tt}")
        nb += 1 if r["is_tie"] else 0
    got["cast_fraction_contracts"] = (len(rows), dig, nb)

    dig = 0
    for r in rows:
        r2 = r["dec"].quantize(_dec.Decimal("0.01"), _dec.ROUND_HALF_UP)
        dig += md5_int(f"{r['eid']}:{r2}")
    got["decimal_tie_round"] = (len(rows), dig, len(rows))

    want = {
        r["kernel"]: (r["n_rows"], r["digest"], r["boundary_rows"])
        for r in duck("overflow_precision_contracts")
    }
    check(
        "overflow_precision_contracts",
        got == want,
        f"{sum(1 for r in rows if r['is_pos'] or r['is_neg'])} boundary "
        f"bigints, {got['mul_try_null'][2]} overflowed products",
    )


# --- unicode_case_contracts: case-mapping / code-point / collation
# semantics from CPython's OWN Unicode tables (a genuinely third
# formulation: the Spark leg is the JVM's case machinery, the DuckDB
# twin is utf8proc plus explicit compensation expressions, and Python
# implements full case mappings + the Final_Sigma context from
# unicodedata — str.upper/str.lower/s[::-1]/len/sorted, no SQL, no
# replace-based rewriting anywhere)
def audit_unicode_case():
    from pdf_using_hugging_face_and_vector_database_spark.queries import (
        UNICASE_DOCS,
        UNICASE_ORD_PAD,
        UNICASE_PREFIX_CHARS,
        UNICASE_TEMPLATES,
    )

    n_cls = len(UNICASE_TEMPLATES)
    docs = [d for d in load("documents") if d["doc_id"] < UNICASE_DOCS]
    rows = []
    for d in docs:
        did = d["doc_id"]
        cls = did % n_cls
        prefix = d["text"][:UNICASE_PREFIX_CHARS]
        tmpl = UNICASE_TEMPLATES[cls]
        rows.append(
            {
                "did": did,
                "cls": cls,
                "prefix": prefix,
                "s": prefix + " " + tmpl,
                "key": tmpl + "#" + str(did).zfill(UNICASE_ORD_PAD),
                "text": d["text"],
            }
        )
    got = {}

    dig = sum(md5_int(f"{r['did']}:{r['s'].upper()}") for r in rows)
    got["upper_fold_expansion"] = (
        len(rows),
        dig,
        sum(1 for r in rows if r["cls"] == 0),
    )

    dig = sum(md5_int(f"{r['did']}:{r['s'].lower()}") for r in rows)
    got["lower_idot_sigma"] = (
        len(rows),
        dig,
        sum(1 for r in rows if r["cls"] in (1, 2)),
    )

    dig = sum(
        md5_int(f"{r['did']}:{r['text'].upper()}:{r['text'].lower()}")
        for r in rows
    )
    got["ascii_casing_agree"] = (
        len(rows),
        dig,
        sum(1 for r in rows if len(r["text"].encode()) != len(r["text"])),
    )

    emoji = "\U0001f600"
    dig = 0
    for r in rows:
        s = r["s"]
        sub = s[UNICASE_PREFIX_CHARS + 1 : UNICASE_PREFIX_CHARS + 10]
        dig += md5_int(
            f"{r['did']}:{len(s)}:{sub}:{s.find('n') + 1}:"
            f"{s.find(emoji) + 1}"
        )
    got["codepoint_metrics"] = (
        len(rows),
        dig,
        sum(1 for r in rows if len(r["s"].encode()) != len(r["s"])),
    )

    rev = [r for r in rows if r["cls"] != 4]
    dig = sum(md5_int(f"{r['did']}:{r['s'][::-1]}") for r in rev)
    got["reverse_codepoint_agree"] = (
        len(rev),
        dig,
        sum(1 for r in rev if r["cls"] == 5),
    )

    # Python string comparison IS code-point order — the contract the
    # leg certifies for both engines' binary collations
    ordered = sorted(rows, key=lambda r: r["key"])
    dig = sum(
        md5_int(f"{r['did']}:{i + 1}") for i, r in enumerate(ordered)
    )
    got["binary_order_rank"] = (
        len(rows),
        dig,
        sum(1 for r in rows if r["cls"] == 5),
    )

    def initcap(p):
        return " ".join(w[:1].upper() + w[1:].lower() for w in p.split(" "))

    dig = sum(md5_int(f"{r['did']}:{initcap(r['prefix'])}") for r in rows)
    got["initcap_ascii"] = (
        len(rows),
        dig,
        sum(1 for r in rows if initcap(r["prefix"]) != r["prefix"]),
    )

    want = {
        r["kernel"]: (r["n_rows"], r["digest"], r["marked_rows"])
        for r in duck("unicode_case_contracts")
    }
    check(
        "unicode_case_contracts",
        got == want,
        f"{len(rows)} augmented docs, "
        f"{got['codepoint_metrics'][2]} multibyte rows, "
        f"{got['ascii_casing_agree'][2]} non-ASCII raw docs",
    )


if __name__ == "__main__":
    audit_sessionize()
    audit_lm_bigram()
    audit_rolling_fp()
    audit_doc_fingerprints()
    audit_retention()
    audit_hybrid_rrf()
    audit_mixture()
    audit_pack()
    audit_weighted_sample()
    audit_gopher()
    audit_dsir()
    audit_pagerank()
    audit_split()
    audit_crossdoc()
    audit_segment_dedup()
    audit_minhash()
    audit_bpe_merges()
    audit_bpe_encode()
    audit_impute()
    audit_value_histogram()
    # wave 2 (round 13)
    audit_embed_quantize()
    audit_quantized_rerank()
    audit_simhash_hamming()
    audit_stream_events_hourly()
    audit_stream_session_windows()
    audit_stream_dedup_keys()
    audit_binary_rerank()
    audit_rolling_distinct_users()
    audit_hostile_text()
    # wave 3 (round 14)
    audit_empty_contracts()
    audit_null_keys()
    audit_float_edges()
    # wave 4 (round 15)
    audit_overflow()
    audit_unicode_case()
    print(("ALL PASS" if not FAIL else f"FAILURES: {FAIL}"))
    sys.exit(1 if FAIL else 0)
