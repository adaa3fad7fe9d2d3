"""DuckDB oracle SQL for every query in queries.py.

Generated from the SAME constants as the Spark implementations
(imported from queries.py / functions/text.py) so the two sides cannot
drift. Arithmetic discipline:

- all hashes are md5 prefixes -> exact integers (bit-identical across
  engines; see functions/hashing.py);
- float folds are written as explicit sequential range()-based sums
  (mirroring Spark's left-fold ``aggregate``), all in DOUBLE;
- double aggregations route through DECIMAL(27,6) so summation order
  cannot matter;
- anything crossing the result boundary as a float is round(x, 6) in
  both engines;
- integer-division / casts avoid DuckDB's round-on-cast vs Spark's
  truncate-on-cast divergence (`//` everywhere, values exact).
"""

from __future__ import annotations

from .functions.text import LANG_MARKERS
from .queries import (
    ANN_ALPHA,
    CROSSDOC_FLAG_FRAC,
    CROSSDOC_MIN_DOCS,
    CROSSDOC_NGRAM,
    GOPHER_DUP_N,
    GOPHER_MAX_DUP3,
    GOPHER_MAX_TOP2,
    GOPHER_MIN_UNIQUE,
    GOPHER_TOP_N,
    HYBRID_K,
    HYBRID_LEG_K,
    RRF_KCONST,
    MIX_CAP,
    MIX_DEFAULT_RATE,
    MIX_RATES,
    MIX_REPEATS,
    MIX_SALT,
    ANN_JOIN_COS,
    ANN_N_LABELS,
    ANN_RECALL_K,
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    EMBED_DIM,
    FETCH_IDS,
    KNN_K,
    KNN_QUERIES,
    MINHASH_BANDS,
    MINHASH_HASHES,
    NEARDUP_TRUNC,
    NGRAM,
    Q4_LABELS,
    QUERY_TEXT,
    SIMHASH_BITS,
    SIMHASH_CHUNKS,
    SIMHASH_MAXH,
    WORD_NGRAM,
)
from .functions.hashing import (
    P_MINHASH,
    det_components_py,
    det_embed_py,
    minhash_params,
)

DEC = "DECIMAL(27,6)"


def _dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {DEC})) AS DOUBLE)"


def _h24(expr: str) -> str:
    """md5 24-bit prefix as BIGINT (== Spark md5_int)."""
    return f"('0x' || substr(md5({expr}), 1, 6))::BIGINT"


def _sql_lit(s: str) -> str:
    """Python string -> DuckDB single-quoted literal. EVERY interpolated
    constant routes through this (ADVICE r13: BPE_TOKEN_RE used to be
    spliced raw — quote/backslash-free today, but a future edit adding
    either would break or silently skew the oracle SQL). NOTE for regex
    literals: DuckDB's regexp_* are RE2, Spark's are Java regex — keep
    shared patterns inside the common dialect subset (character
    classes, alternation, + * ?; no backrefs, no lookaround, no \\p
    differences), or the two engines match different things even with
    correct quoting."""
    return "'" + s.replace("'", "''") + "'"


def _dot(a: str, b: str, dim: int) -> str:
    """Sequential double dot product (== functions.vector.dot)."""
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    )


def _cos(a: str, b: str, dim: int) -> str:
    return (
        f"({_dot(a, b, dim)} / "
        f"(sqrt({_dot(a, a, dim)}) * sqrt({_dot(b, b, dim)})))"
    )


def _vec_literal(vec: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in vec) + "]::DOUBLE[]"


def _ngrams(text: str, n: int) -> str:
    """char n-gram list (== functions.text.char_ngrams)."""
    return (
        f"CASE WHEN length({text}) < {n} THEN [{text}] "
        f"ELSE list_transform(range(1, length({text}) - {n} + 2), "
        f"i -> substr({text}, i, {n})) END"
    )


def _element_hashes(elements: str, nhex: int = 6) -> str:
    """md5 of each element, hashed once (== functions.hashing.element_hashes)."""
    return (
        f"list_transform({elements}, "
        f"s -> ('0x' || substr(md5(s), 1, {nhex}))::BIGINT)"
    )


def _minhash_from_hashes(hs: str, num_hashes: int) -> str:
    """sig_k = min_h (a_k*h + b_k) % p — same (a,b,p) constants as Spark."""
    mins = [
        f"list_min(list_transform({hs}, h -> (h * {a} + {b}) % {P_MINHASH}))"
        for a, b in minhash_params(num_hashes)
    ]
    return "[" + ", ".join(mins) + "]"


def _tokens(text: str) -> str:
    return f"list_filter(string_split({text}, ' '), x -> x <> '')"


def _word_ngrams(text: str, n: int, drop_empty: bool = False) -> str:
    """Word n-gram shingles, space-joined. ``drop_empty`` mirrors the
    two Spark conventions (r10 review): quality / contamination paths
    (curation's exploded word-n-gram helper — gopher, crossdoc,
    contamination) drop the zero-token doc's '' gram, which would
    otherwise flag every pair of empty docs as mutually contaminated;
    the DEDUP / set-similarity paths (dedup's minhash word mode,
    setjoin's word-gram set builder) KEEP it, because two empty docs
    ARE duplicates and must keep matching."""
    toks = _tokens(text)
    grams = (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )
    if drop_empty:
        return f"list_filter({grams}, g -> g <> '')"
    return grams


def _simhash_bits(hs: str, bits: int) -> str:
    """SimHash from pre-computed hashes; bits via shift+mask (== Spark)."""
    terms = []
    for b in range(bits):
        pw = 2**b
        bit_sum = (
            f"list_sum(list_transform({hs}, "
            f"h -> CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {bit_sum} > 0 THEN {pw} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")::BIGINT"


def _simhash16(hs: str) -> str:
    return _simhash_bits(hs, 16)


def _stopword_score(lang: str) -> str:
    parts = []
    for w in LANG_MARKERS[lang]:
        needle = f" {w} "
        parts.append(
            f"((length(p) - length(replace(p, '{needle}', ''))) // {len(needle)})"
        )
    return "(" + " + ".join(parts) + ")::INT"


def _lang_case() -> str:
    langs = list(LANG_MARKERS)
    whens = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in langs[i + 1 :]
        )
        whens.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(whens) + f" ELSE '{langs[-1]}' END"


# chunker arithmetic shared by several queries; size/overlap default to
# the suite constants (120/20) — flagship_e1 replays the reference's
# 2000/100 defaults through the same CTE
def _chunks_cte(
    extra_cols: str = "",
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> str:
    stride = size - overlap
    return f"""
  SELECT doc_id{extra_cols}, chunk_index::INT AS chunk_index,
         substr(text, chunk_index * {stride} + 1, {size}) AS chunk_text
  FROM (
    SELECT doc_id{extra_cols}, text,
           unnest(range(0, CASE WHEN length(text) <= {size} THEN 1
                ELSE 1 + ((length(text) - {size} + {stride - 1}) // {stride}) END)) AS chunk_index
    FROM documents)
"""


def _det_embed(text_expr: str, dim: int) -> str:
    """raw components list v (pre-normalization), == hash_components."""
    return (
        f"list_transform(range(0, {dim}), "
        f"j -> {_h24(text_expr + ' || ' + chr(39) + ':' + chr(39) + ' || j::VARCHAR')}"
        f" / 16777215.0 * 2.0 - 1.0)"
    )


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["q1_cosine_topk"] = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.label, {_cos('e.embedding', 'q.qv', EMBED_DIM)} AS s
  FROM embeddings e CROSS JOIN q)
SELECT vec_id, label, round(s, 6) AS score
FROM scored ORDER BY s DESC, vec_id LIMIT 10
"""

    # int8-prefilter + exact re-rank twin: the full two-stage pipeline
    # (per-vector symmetric quantization, exact integer code dot,
    # deterministic candidate cut, double-cosine re-rank) replicated
    # end to end — quantization arithmetic shared with embed_quantize
    from .queries import ANN_RERANK_CAND

    sql["q3_ann_quantized_rerank"] = f"""
WITH coded AS (
  SELECT vec_id, label, v,
         list_transform(v,
           x -> least(greatest(round(x / scale), -127.0), 127.0)::INT) AS codes
  FROM (
    SELECT vec_id, label, embedding::DOUBLE[] AS v,
           greatest(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))),
                    1e-12) / 127.0 AS scale
    FROM embeddings)),
q AS (SELECT v AS qv, codes AS qcodes FROM coded WHERE vec_id = 0),
scored AS (
  SELECT c.vec_id, c.label, c.v, q.qv,
         list_sum(list_transform(range(1, {EMBED_DIM + 1}),
           i -> (c.codes[i] * q.qcodes[i])::BIGINT))::BIGINT AS q_dot
  FROM coded c CROSS JOIN q),
cands AS (
  SELECT * FROM scored ORDER BY q_dot DESC, vec_id LIMIT {ANN_RERANK_CAND}),
rer AS (
  SELECT vec_id, label, q_dot, {_cos('v', 'qv', EMBED_DIM)} AS s FROM cands)
SELECT vec_id, label, q_dot, round(s, 6) AS score
FROM rer ORDER BY s DESC, vec_id LIMIT 10
"""

    # MMR: replay the 10-round greedy diversified selection — chained
    # argmax CTEs with the same 9dp-rounded scores and id tie-breaks
    from .queries import MMR_K, MMR_LAMBDA, MMR_POOL

    _lam = f"{MMR_LAMBDA!r}::DOUBLE"
    _oml = f"{1.0 - MMR_LAMBDA!r}::DOUBLE"
    mmr_ctes = [
        "mq AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)",
        f"""mcands AS MATERIALIZED (
  SELECT vec_id, v, round({_cos('v', 'mq.qv', EMBED_DIM)}, 9) AS simq
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
  CROSS JOIN mq
  ORDER BY simq DESC, vec_id LIMIT {MMR_POOL})""",
        f"""mps AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         round({_cos('a.v', 'b.v', EMBED_DIM)}, 9) AS sim
  FROM mcands a JOIN mcands b ON a.vec_id <> b.vec_id)""",
        f"""mp1 AS MATERIALIZED (
  SELECT vec_id, simq FROM mcands
  ORDER BY round({_lam} * simq - {_oml} * 0.0::DOUBLE, 9) DESC, vec_id
  LIMIT 1)""",
        "ms1 AS (SELECT vec_id FROM mp1)",
    ]
    for r in range(2, MMR_K + 1):
        mmr_ctes.append(
            f"""mp{r} AS MATERIALIZED (
  SELECT c.vec_id, c.simq
  FROM mcands c LEFT JOIN (
    SELECT ia AS vec_id, max(sim) AS pen FROM mps
    WHERE ib IN (SELECT vec_id FROM ms{r - 1}) GROUP BY ia) pn
  USING (vec_id)
  WHERE c.vec_id NOT IN (SELECT vec_id FROM ms{r - 1})
  ORDER BY round({_lam} * c.simq - {_oml} * coalesce(pn.pen, 0.0::DOUBLE), 9)
           DESC, c.vec_id
  LIMIT 1)"""
        )
        mmr_ctes.append(
            f"ms{r} AS (SELECT vec_id FROM ms{r - 1} "
            f"UNION ALL SELECT vec_id FROM mp{r})"
        )
    mmr_union = "\nUNION ALL\n".join(
        f"SELECT {r}::INT AS rank, vec_id, round(simq, 6) AS simq FROM mp{r}"
        for r in range(1, MMR_K + 1)
    )
    sql["mmr_diversified_topk"] = (
        "WITH " + ",\n".join(mmr_ctes) + "\n" + mmr_union
    )

    # PageRank: 5-round chained-CTE power-method replay. The teleport
    # numerator and damping ride as repr() double literals so both
    # engines divide/multiply the SAME doubles; contributions are
    # 9dp-rounded and decimal-summed exactly like the Spark side.
    from .queries import PR_DAMPING, PR_ITERS

    _tn = repr(1.0 - PR_DAMPING)
    _d = repr(PR_DAMPING)
    pr_ctes = [
        """pairs AS MATERIALIZED (
  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        """pr_edges AS MATERIALIZED (
  SELECT src, dst FROM pairs
  UNION SELECT dst AS src, src AS dst FROM pairs)""",
        """pr_nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM pr_edges UNION ALL SELECT dst FROM pr_edges))""",
        "nn AS (SELECT count(*)::BIGINT AS n FROM pr_nodes)",
        """pr_deg AS MATERIALIZED (
  SELECT src, count(*)::BIGINT AS out_deg FROM pr_edges GROUP BY src)""",
        """pr0 AS MATERIALIZED (
  SELECT node, round(1.0::DOUBLE / (SELECT n FROM nn), 9) AS rank
  FROM pr_nodes)""",
    ]
    for k in range(PR_ITERS):
        pr_ctes.append(
            f"""pa{k} AS (
  SELECT e.dst AS node,
         CAST(SUM(CAST(round(r.rank / d.out_deg, 9) AS DECIMAL(27,9)))
              AS DOUBLE) AS inflow
  FROM pr_edges e JOIN pr_deg d ON e.src = d.src
  JOIN pr{k} r ON e.src = r.node
  GROUP BY e.dst)"""
        )
        pr_ctes.append(
            f"""pr{k + 1} AS MATERIALIZED (
  SELECT n.node,
         round({_tn}::DOUBLE / (SELECT n FROM nn)
               + {_d}::DOUBLE * coalesce(a.inflow, 0.0::DOUBLE), 9) AS rank
  FROM pr_nodes n LEFT JOIN pa{k} a USING (node))"""
        )
    sql["supplier_pagerank"] = (
        "WITH "
        + ",\n".join(pr_ctes)
        + f"\nSELECT node, round(rank, 6) AS rank FROM pr{PR_ITERS}\n"
    )

    # clustering gate: content through the re-layout must be exact
    from .queries import CLUSTER_BAND

    sql["store_clustering"] = f"""
SELECT l_returnflag, count(*)::BIGINT AS n_items,
       CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty,
       SUM(l_orderkey)::BIGINT AS sum_keys
FROM lineitem
WHERE l_shipdate >= '{CLUSTER_BAND[0]}' AND l_shipdate < '{CLUSTER_BAND[1]}'
GROUP BY l_returnflag
"""

    # rolling distinct: correlated band-subquery twin (neither engine
    # has a windowed DISTINCT aggregate). Integer day key floors the
    # epoch explicitly — DuckDB's epoch() ROUNDS fractional seconds
    # where Spark's unix_timestamp truncates (the events_gapfill trap)
    sql["rolling_distinct_users"] = """
WITH daily AS (
  SELECT DISTINCT event_type,
         (floor(epoch(ts))::BIGINT // 86400) AS day, user_id
  FROM events),
days AS (SELECT DISTINCT event_type, day FROM daily)
SELECT d.event_type, d.day,
       (SELECT count(DISTINCT u.user_id) FROM daily u
        WHERE u.event_type = d.event_type
          AND u.day BETWEEN d.day - 2 AND d.day)::INT AS distinct_users_3d
FROM days d
"""

    # sketch variant: exact counts recomputed (band subquery), the
    # sketch-vs-exact bound asserted as a literal — DuckDB's own HLL
    # differs bit-for-bit, so only the CHECKED bound is replayable
    sql["rolling_distinct_users_sketch"] = """
WITH daily AS (
  SELECT DISTINCT event_type,
         (floor(epoch(ts))::BIGINT // 86400) AS day, user_id
  FROM events),
days AS (SELECT DISTINCT event_type, day FROM daily)
SELECT d.event_type, d.day,
       (SELECT count(DISTINCT u.user_id) FROM daily u
        WHERE u.event_type = d.event_type
          AND u.day BETWEEN d.day - 2 AND d.day)::INT AS distinct_users_3d,
       TRUE AS err_ok
FROM days d
"""

    # incremental-IVF append: counts recomputed from the source table;
    # the no-op and self-match invariants are mathematically
    # guaranteed (see the query docstring) and asserted as literals
    sql["q3_ann_append"] = """
SELECT
  (SELECT count(*) FROM embeddings WHERE vec_id % 50 <> 7)::BIGINT AS n_base,
  (SELECT count(*) FROM embeddings WHERE vec_id % 50 = 7)::BIGINT AS n_appended,
  (SELECT count(*) FROM embeddings)::BIGINT AS n_total,
  TRUE AS reappend_noop,
  7::BIGINT AS top1_id,
  1.0::DOUBLE AS top1_score
"""

    # imputation audit: same corruption, same surviving-median repair
    sql["impute_event_values"] = f"""
WITH holed AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 9 = 0 THEN NULL ELSE value END AS value
  FROM events),
med AS (
  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
  FROM holed GROUP BY event_type),
rep AS (
  SELECT h.event_type, h.value, coalesce(h.value, m.med) AS repaired, m.med
  FROM holed h JOIN med m USING (event_type))
SELECT event_type, count(*)::BIGINT AS n_rows,
       SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_imputed,
       any_value(med) AS imputation_value,
       CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_before,
       CAST(SUM(CAST(repaired AS {DEC})) AS DOUBLE) AS sum_after
FROM rep GROUP BY event_type
"""

    # equi-depth histogram: same ntile under the same total order
    from .queries import HIST_BINS

    sql["value_histogram"] = f"""
WITH binned AS (
  SELECT value, ntile({HIST_BINS}) OVER (ORDER BY value, event_id) AS bin
  FROM events)
SELECT bin::INT AS bin, count(*)::BIGINT AS n,
       round(min(value), 6) AS lo, round(max(value), 6) AS hi,
       CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
FROM binned GROUP BY bin
"""

    # skew report: counts, top-n, and every ratio recomputed
    sql["lineitem_skew_report"] = """
WITH counts AS (
  SELECT l_orderkey AS key, count(*)::BIGINT AS cnt
  FROM lineitem GROUP BY 1),
stats AS (
  SELECT count(*)::BIGINT AS n_keys, SUM(cnt)::BIGINT AS n_rows,
         MAX(cnt)::BIGINT AS max_cnt
  FROM counts),
top AS (
  SELECT key, cnt, row_number() OVER (ORDER BY cnt DESC, key) AS rank
  FROM counts ORDER BY cnt DESC, key LIMIT 5)
SELECT rank::INT AS rank, key::VARCHAR AS key, cnt,
       round(cnt::DOUBLE / s.n_rows::DOUBLE, 6) AS share,
       s.n_keys, s.n_rows,
       round(s.n_rows::DOUBLE / s.n_keys::DOUBLE, 6) AS mean_cnt,
       round(s.max_cnt::DOUBLE / (s.n_rows::DOUBLE / s.n_keys::DOUBLE), 6)
         AS skew_factor
FROM top CROSS JOIN stats s
"""

    # LSH-vs-exact audit: recompute the all-pairs truth AND the banded
    # candidate set, then the recall arithmetic
    from .queries import LSH_AUDIT_FLOOR, PPJOIN_THRESHOLD

    _rpb = MINHASH_HASHES // MINHASH_BANDS
    sql["lsh_exact_audit"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         substr(text, 1, length(text) - {NEARDUP_TRUNC}) AS text
  FROM documents),
g AS (SELECT doc_id, list_distinct({_word_ngrams('text', WORD_NGRAM)}) AS g FROM corpus),
gsz AS (SELECT doc_id, len(g) AS s FROM g WHERE len(g) > 0),
e AS (SELECT doc_id, unnest(g) AS el FROM g),
m AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM e a JOIN e b ON a.el = b.el AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
truth AS (
  SELECT m.id_a, m.id_b
  FROM m JOIN gsz sa ON sa.doc_id = m.id_a JOIN gsz sb ON sb.doc_id = m.id_b
  WHERE m.inter::DOUBLE / (sa.s + sb.s - m.inter)::DOUBLE >= {PPJOIN_THRESHOLD}),
hashed AS (SELECT doc_id, {_element_hashes(_word_ngrams('text', WORD_NGRAM))} AS hs FROM corpus),
sigs AS (SELECT doc_id, {_minhash_from_hashes('hs', MINHASH_HASHES)} AS sig FROM hashed),
banded AS (
  SELECT doc_id, b::INT AS band_index,
         list_slice(sig, b * {_rpb} + 1, (b + 1) * {_rpb}) AS band_sig
  FROM (SELECT doc_id, sig, unnest(range(0, {MINHASH_BANDS})) AS b FROM sigs)),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band_index = r.band_index AND l.band_sig = r.band_sig
   AND l.doc_id < r.doc_id),
counts AS (
  SELECT (SELECT count(*) FROM truth)::BIGINT AS n_truth,
         (SELECT count(*) FROM cand)::BIGINT AS n_candidates,
         (SELECT count(*) FROM truth t
          WHERE EXISTS (SELECT 1 FROM cand c
                        WHERE c.id_a = t.id_a AND c.id_b = t.id_b))::BIGINT
           AS n_hits)
SELECT n_truth, n_candidates, n_hits,
       round(n_hits::DOUBLE / n_truth::DOUBLE, 6) AS recall,
       round(n_hits::DOUBLE / n_truth::DOUBLE, 6) >= {LSH_AUDIT_FLOOR}
         AS recall_ok
FROM counts
"""

    # Misra-Gries gate: exact counts + the theorem booleans as literal
    # trues (the summary is partition-order-dependent; the bound isn't)
    from .queries import MG_K

    sql["heavy_hitters_events"] = f"""
WITH n AS (SELECT count(*)::DOUBLE AS n FROM events)
SELECT event_type AS item, count(*)::BIGINT AS exact_count,
       TRUE AS present, TRUE AS within_bound
FROM events GROUP BY event_type
HAVING count(*) > (SELECT n / {MG_K + 1.0} FROM n)
"""

    # RAG capstone: the full chunk -> embed -> int8 prefilter -> exact
    # pool -> 10-round MMR chain replayed from the raw documents table
    from .queries import MMR_LAMBDA as _RL, RAG_K, RAG_POOL

    _rlam = f"{_RL!r}::DOUBLE"
    _roml = f"{1.0 - _RL!r}::DOUBLE"
    _qtxt = "'" + QUERY_TEXT + "'"
    rag_ctes = [
        f"rchunks AS ({_chunks_cte(extra_cols=', source')})",
        f"""remb AS (
  SELECT 'doc-' || doc_id || '-' || chunk_index AS id,
         doc_id, chunk_index, source,
         {_det_embed('chunk_text', EMBED_DIM)} AS rv
  FROM rchunks)""",
        """rnv AS MATERIALIZED (
  SELECT id, doc_id, chunk_index, source,
         list_transform(rv, x -> x / n) AS v
  FROM (SELECT *, sqrt(list_sum(list_transform(rv, x -> x * x))) AS n
        FROM remb))""",
        """rcoded AS MATERIALIZED (
  SELECT id, list_transform(v,
           x -> least(greatest(round(x / scale), -127.0), 127.0)::INT) AS codes
  FROM (SELECT id, v,
               greatest(list_max(list_transform(v, x -> abs(x))), 1e-12)
                 / 127.0 AS scale
        FROM rnv))""",
        f"""rq AS (
  SELECT qv, list_transform(qv,
           x -> least(greatest(round(x / scale), -127.0), 127.0)::INT) AS qcodes
  FROM (SELECT qv, greatest(list_max(list_transform(qv, x -> abs(x))), 1e-12)
                 / 127.0 AS scale
        FROM (SELECT {_det_embed(_qtxt, EMBED_DIM)} AS qv)))""",
        f"""rcands AS MATERIALIZED (
  SELECT c.id FROM rcoded c CROSS JOIN rq
  ORDER BY list_sum(list_transform(range(1, {EMBED_DIM + 1}),
             i -> (c.codes[i] * rq.qcodes[i])::BIGINT))::BIGINT DESC, c.id
  LIMIT {RAG_POOL})""",
        f"""rpool AS MATERIALIZED (
  SELECT n.id, n.v, round({_cos('n.v', 'rq.qv', EMBED_DIM)}, 9) AS simq
  FROM rnv n JOIN rcands USING (id) CROSS JOIN rq)""",
        f"""rps AS MATERIALIZED (
  SELECT a.id AS ia, b.id AS ib,
         round({_cos('a.v', 'b.v', EMBED_DIM)}, 9) AS sim
  FROM rpool a JOIN rpool b ON a.id <> b.id)""",
        f"""rp1 AS MATERIALIZED (
  SELECT id, simq FROM rpool
  ORDER BY round({_rlam} * simq - {_roml} * 0.0::DOUBLE, 9) DESC, id
  LIMIT 1)""",
        "rs1 AS (SELECT id FROM rp1)",
    ]
    for r in range(2, RAG_K + 1):
        rag_ctes.append(
            f"""rp{r} AS MATERIALIZED (
  SELECT c.id, c.simq
  FROM rpool c LEFT JOIN (
    SELECT ia AS id, max(sim) AS pen FROM rps
    WHERE ib IN (SELECT id FROM rs{r - 1}) GROUP BY ia) pn
  USING (id)
  WHERE c.id NOT IN (SELECT id FROM rs{r - 1})
  ORDER BY round({_rlam} * c.simq - {_roml} * coalesce(pn.pen, 0.0::DOUBLE), 9)
           DESC, c.id
  LIMIT 1)"""
        )
        rag_ctes.append(
            f"rs{r} AS (SELECT id FROM rs{r - 1} UNION ALL SELECT id FROM rp{r})"
        )
    rag_union = "\nUNION ALL\n".join(
        f"SELECT {r}::INT AS rank, id, simq FROM rp{r}"
        for r in range(1, RAG_K + 1)
    )
    sql["rag_pipeline"] = (
        "WITH "
        + ",\n".join(rag_ctes)
        + f"""
SELECT m.rank, m.id, n.doc_id, n.chunk_index, n.source,
       round(m.simq, 6) AS simq
FROM ({rag_union}) m JOIN rnv n USING (id)
"""
    )

    # weighted sampling: replay every Efraimidis-Spirakis draw
    from .queries import WRS_PER_SOURCE

    sql["weighted_sample"] = f"""
WITH scored AS (
  SELECT doc_id, source,
         len({_tokens('text')})::INT AS weight,
         round(-ln((('0x' || substr(md5('wrs:' || doc_id::VARCHAR), 1, 6))::BIGINT
                    + 1)::DOUBLE / {float((1 << 24) + 1)!r})
               / len({_tokens('text')})::DOUBLE, 9) AS k
  FROM documents
  -- zero-weight (empty) docs are EXCLUDED, matching the Spark side
  -- (r11 review: NULL sort keys place opposite ways across engines)
  WHERE len({_tokens('text')}) > 0),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY k, doc_id) AS rank
  FROM scored)
SELECT source, doc_id, weight, rank::INT AS rank
FROM ranked WHERE rank <= {WRS_PER_SOURCE}
"""

    # entity resolution: replay block + levenshtein + argmin
    # DELIBERATELY nation-only blocking (no suffix refinement): this
    # is the unblocked-within-nation truth, so a green hash also
    # proves the Spark side's finer composite key — (right(name,3),
    # nation), 387x fewer candidate pairs at sf0.1 — drops no pair
    # that changes any argmin (see the query docstring)
    sql["entity_resolution"] = """
WITH dirty AS (
  SELECT c_custkey + 1000000 AS dirty_id,
         substr(c_name, 1, 2) || substr(c_name, 4) AS dname,
         c_nationkey
  FROM customer WHERE c_custkey % 4 = 0),
pairs AS (
  SELECT d.dirty_id, c.c_custkey AS match_id,
         levenshtein(d.dname, c.c_name)::INT AS lev,
         length(d.dname) AS dl, length(c.c_name) AS cl
  FROM dirty d JOIN customer c ON d.c_nationkey = c.c_nationkey
  WHERE levenshtein(d.dname, c.c_name) <= 3),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY dirty_id
                               ORDER BY lev, match_id) AS rn
  FROM pairs)
SELECT dirty_id, match_id, lev,
       round(1.0 - lev::DOUBLE / greatest(dl, cl)::DOUBLE, 6) AS name_sim
FROM ranked WHERE rn = 1
"""

    # snapshot diff: rebuild v2 + full-outer reconciliation
    sql["snapshot_diff"] = """
WITH v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN source || '_v2' ELSE source END AS source,
         CASE WHEN doc_id % 5 = 0 THEN upper(text) ELSE text END AS text
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT 900000 + i AS doc_id, 'srcnew' AS source,
         'new doc ' || i AS text
  FROM (SELECT unnest(range(0, 30)) AS i)),
j AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         o.doc_id IS NOT NULL AS in_old, n.doc_id IS NOT NULL AS in_new,
         CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL THEN
           list_sort(
             (CASE WHEN o.source IS DISTINCT FROM n.source
                   THEN ['source'] ELSE [] END)
             || (CASE WHEN o.text IS DISTINCT FROM n.text
                      THEN ['text'] ELSE [] END))
         ELSE [] END AS changed_cols
  FROM documents o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id)
SELECT doc_id,
       CASE WHEN NOT in_old THEN 'insert'
            WHEN NOT in_new THEN 'delete'
            ELSE 'update' END AS change_type,
       -- DuckDB's array_to_string([]) is NULL, Spark's array_join is ''
       coalesce(array_to_string(changed_cols, ','), '') AS changed_cols
FROM j
WHERE NOT in_old OR NOT in_new OR len(changed_cols) > 0
"""

    # z-order gate: 2-D band digest, content through the re-layout
    from .queries import ZORDER_KEY_BAND

    sql["store_zorder"] = f"""
SELECT l_returnflag, count(*)::BIGINT AS n_items,
       CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty,
       SUM(l_orderkey)::BIGINT AS sum_keys
FROM lineitem
WHERE l_orderkey >= {ZORDER_KEY_BAND[0]} AND l_orderkey < {ZORDER_KEY_BAND[1]}
  AND l_shipdate >= '{CLUSTER_BAND[0]}' AND l_shipdate < '{CLUSTER_BAND[1]}'
GROUP BY l_returnflag
"""

    # MV refresh gate: the incremental splice must equal a full
    # from-scratch recompute
    sql["mv_incremental_refresh"] = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus,
       count(*)::BIGINT AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS revenue
FROM orders GROUP BY 1, 2
"""
    # the streamed continuous aggregate must converge to the same
    # from-scratch recompute (additive decimal folds are associative)
    sql["stream_mv_refresh"] = sql["mv_incremental_refresh"]

    # compaction gate: the rewrite must preserve content exactly, so
    # the digest of the compacted store must equal the digest of the
    # source table
    sql["store_compaction"] = """
SELECT source, count(*)::BIGINT AS n_docs, SUM(doc_id)::BIGINT AS sum_ids,
       SUM(('0x' || substr(md5(text), 1, 6))::BIGINT)::BIGINT AS sum_text_hash
FROM documents GROUP BY source
"""

    # retrieval-eval: replay the int8 stage-1 ranking AND the exact
    # truth ranking, then recompute recall/MRR/NDCG with the same
    # driver-literal discount table the Spark side uses
    from .queries import EVAL_K, IDCG_AT_K, NDCG_DISCOUNTS

    _disc_list = "[" + ", ".join(repr(d) for d in NDCG_DISCOUNTS) + "]"
    sql["retrieval_eval"] = f"""
WITH coded AS (
  SELECT vec_id, label, v,
         list_transform(v,
           x -> least(greatest(round(x / scale), -127.0), 127.0)::INT) AS codes
  FROM (
    SELECT vec_id, label, embedding::DOUBLE[] AS v,
           greatest(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))),
                    1e-12) / 127.0 AS scale
    FROM embeddings)),
q AS (SELECT v AS qv, codes AS qcodes FROM coded WHERE vec_id = 0),
scored AS (
  SELECT c.vec_id,
         list_sum(list_transform(range(1, {EMBED_DIM + 1}),
           i -> (c.codes[i] * q.qcodes[i])::BIGINT))::BIGINT AS q_dot
  FROM coded c CROSS JOIN q),
sysr AS (
  SELECT vec_id, row_number() OVER (ORDER BY q_dot DESC, vec_id) AS rank
  FROM (SELECT * FROM scored ORDER BY q_dot DESC, vec_id LIMIT {EVAL_K})),
truth AS (
  SELECT vec_id, 1 AS rel FROM (
    SELECT c.vec_id, {_cos('c.v', 'q.qv', EMBED_DIM)} AS s
    FROM coded c CROSS JOIN q)
  ORDER BY s DESC, vec_id LIMIT {EVAL_K}),
j AS (
  SELECT s.rank,
         coalesce(t.rel, 0) AS rel,
         ({_disc_list})[s.rank] AS disc
  FROM sysr s LEFT JOIN truth t USING (vec_id))
SELECT {EVAL_K} AS k,
       SUM(rel)::BIGINT AS n_relevant,
       round(SUM(rel)::DOUBLE / {float(EVAL_K)!r}, 6) AS recall_at_k,
       round(MAX(rel::DOUBLE / rank::DOUBLE), 6) AS mrr,
       round(CAST(SUM(CAST(CASE WHEN rel = 1 THEN disc ELSE 0.0 END
                           AS DECIMAL(27,9))) AS DOUBLE)
             / {IDCG_AT_K!r}, 6) AS ndcg_at_k
FROM j
"""

    # binary (sign-bit) prefilter + exact re-rank twin: packed 32-bit
    # words as explicit conditional sums (shift < 32 keeps every word
    # an overflow-safe BIGINT in both engines), Hamming via
    # xor+bit_count, deterministic cut, double-cosine re-rank
    from .queries import BIN_CAND, BIN_QUERY_ID

    def _bin_word(vec: str, j: int, bits: int = 32) -> str:
        terms = " + ".join(
            f"(CASE WHEN {vec}[{j * bits + i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(bits)
        )
        return f"({terms})::BIGINT"

    _nw = EMBED_DIM // 32
    _code_cols = ", ".join(
        f"{_bin_word('embedding', j)} AS w{j}" for j in range(_nw)
    )
    _q_cols = ", ".join(f"w{j} AS qw{j}" for j in range(_nw))
    _ham = " + ".join(f"bit_count(xor(c.w{j}, q.qw{j}))" for j in range(_nw))
    sql["q3_ann_binary_rerank"] = f"""
WITH codes AS (
  SELECT vec_id, label, {_code_cols} FROM embeddings),
q AS (SELECT {_q_cols} FROM codes WHERE vec_id = {BIN_QUERY_ID}),
cand AS (
  SELECT c.vec_id, c.label, ({_ham})::INT AS hamming
  FROM codes c CROSS JOIN q
  ORDER BY hamming, c.vec_id LIMIT {BIN_CAND}),
rer AS (
  SELECT cand.vec_id, cand.label, cand.hamming,
         {_cos('e.v', 'qe.qv', EMBED_DIM)} AS s
  FROM cand
  JOIN (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e USING (vec_id)
  CROSS JOIN (SELECT embedding::DOUBLE[] AS qv FROM embeddings
              WHERE vec_id = {BIN_QUERY_ID}) qe)
SELECT vec_id, label, hamming, round(s, 6) AS score
FROM rer ORDER BY s DESC, vec_id LIMIT 10
"""

    sql["q2_knn_join"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {KNN_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id, {_cos('e.embedding', 'q.qv', EMBED_DIM)} AS s
  FROM embeddings e CROSS JOIN q),
ranked AS (
  SELECT query_id, vec_id, s,
         row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rn
  FROM scored)
SELECT query_id, vec_id, round(s, 6) AS score, rn::INT AS rank
FROM ranked WHERE rn <= {KNN_K}
"""

    qv = _vec_literal(det_embed_py(QUERY_TEXT, EMBED_DIM))
    labels = ", ".join(str(x) for x in Q4_LABELS)
    sql["q4_filtered_topk"] = f"""
WITH q AS (SELECT {qv} AS qv),
scored AS (
  SELECT e.vec_id, e.label, {_cos('e.embedding', 'q.qv', EMBED_DIM)} AS s
  FROM embeddings e CROSS JOIN q
  WHERE e.label IN ({labels}))
SELECT vec_id, label, round(s, 6) AS score
FROM scored ORDER BY s DESC, vec_id LIMIT 10
"""

    # q3_ann_recall: DuckDB recomputes the EXACT top-k over the same
    # label-clustered derived corpus (bit-identical double arithmetic);
    # recall_ok is asserted TRUE — DuckDB can't run the IVF side, so
    # the Spark query folds its measured recall>=0.9 into a boolean
    # that must match this constant.
    cents = [det_embed_py(f"cluster:{l}", EMBED_DIM) for l in range(ANN_N_LABELS)]
    cent_lit = (
        "["
        + ", ".join("[" + ", ".join(repr(x) for x in c) + "]" for c in cents)
        + "]::DOUBLE[][]"
    )
    sql["q3_ann_recall"] = f"""
WITH cents AS (SELECT {cent_lit} AS cs),
derived AS (
  SELECT vec_id, list_transform(range(1, {EMBED_DIM + 1}),
         i -> cs[label + 1][i] + {ANN_ALPHA!r}::DOUBLE * embedding[i]) AS e
  FROM embeddings CROSS JOIN cents),
q AS (SELECT e AS qv FROM derived WHERE vec_id = 0),
scored AS (
  SELECT d.vec_id, {_cos('d.e', 'q.qv', EMBED_DIM)} AS s
  FROM derived d CROSS JOIN q),
topk AS (SELECT vec_id FROM scored ORDER BY s DESC, vec_id LIMIT {ANN_RECALL_K})
SELECT {ANN_RECALL_K}::INT AS k,
       array_to_string(list_sort(list(vec_id)), '-') AS exact_ids,
       TRUE AS recall_ok
FROM topk
"""

    # q3_ann_build / q3_ann_ivf / q3_ann_lsh: the cell geometry and
    # returned id sets are k-means-init / projection dependent, so the
    # Spark side emits seed-INDEPENDENT invariants (coverage counts,
    # probe-score==exact-cosine, ordering, recall floors) and the
    # oracle recomputes the counts from the source table and asserts
    # the booleans TRUE — closing the last rows-only gaps (round 4).
    sql["q3_ann_build"] = """
SELECT count(*) AS total_assigned,
       count(DISTINCT vec_id) AS distinct_vecs,
       TRUE AS cells_ok
FROM embeddings
"""

    sql["q3_ann_ivf"] = """
SELECT LEAST(10, (SELECT count(*) FROM embeddings))::INT AS k,
       TRUE AS scores_exact_ok,
       TRUE AS sorted_ok,
       TRUE AS recall_ok
"""

    sql["q3_ann_lsh"] = """
SELECT LEAST(10, (SELECT count(*) FROM embeddings))::INT AS k,
       TRUE AS dists_exact_ok,
       TRUE AS sorted_ok,
       TRUE AS recall_ok
"""

    # q3_ann_lsh_join: DuckDB recomputes the EXACT cosine>=threshold
    # pair set (count + sorted digest, bit-identical rounding); the
    # Spark side folds its measured LSH-join recall/precision >= 0.9
    # into booleans that must match these TRUE constants.
    sql["q3_ann_lsh_join"] = f"""
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE round({_cos('a.embedding', 'b.embedding', EMBED_DIM)}, 6) >= {ANN_JOIN_COS!r}),
strs AS (SELECT id_a::VARCHAR || ':' || id_b::VARCHAR AS p FROM pairs)
SELECT count(*) AS n_exact_pairs,
       coalesce(string_agg(p, ',' ORDER BY p), '') AS pair_digest,
       TRUE AS recall_ok,
       TRUE AS precision_ok
FROM strs
"""

    ids = ", ".join(str(x) for x in FETCH_IDS)
    sql["q5_fetch_by_ids"] = f"""
SELECT vec_id, label, len(embedding)::INT AS dim
FROM embeddings WHERE vec_id IN ({ids})
"""

    sql["q5_delete_by_ids"] = f"""
SELECT vec_id, label, len(embedding)::INT AS dim
FROM embeddings WHERE vec_id NOT IN ({ids})
"""

    # multimodal plumbing twins: the fake decode kernel derives dims
    # and raster from md5 of the content bytes (see
    # operators/multimodal.py), so the whole decode->feature chain is
    # reproducible: width/height from the digest's first two bytes,
    # raster = digest('<text>:raster') * 4 (hex = md5 hex repeated).
    from .queries import FRAME_EVERY, N_FRAMES_MOD

    b0 = "('0x' || substr(md5(text), 1, 2))::INT"
    b1 = "('0x' || substr(md5(text), 3, 2))::INT"
    sql["media_pipeline"] = f"""
SELECT doc_id AS media_id,
       (16 + {b0} % 64)::INT AS width,
       (16 + {b1} % 64)::INT AS height,
       64::INT AS raster_bytes,
       ((16 + {b0} % 64) * (16 + {b1} % 64))::INT AS pixels,
       repeat(md5(text || ':raster'), 4) AS raster_hex
FROM documents
"""

    # max_frames=8 never binds: n_frames = doc_id % {N_FRAMES_MOD} < 40
    # -> at most ceil(40/10)=4 sampled frames per video
    sql["video_frame_sample"] = f"""
SELECT doc_id AS media_id, f::INT AS frame_no,
       md5(text || ':frame:' || f::VARCHAR) AS frame_md5
FROM (
  SELECT doc_id, text, unnest(range(0, doc_id % {N_FRAMES_MOD}, {FRAME_EVERY})) AS f
  FROM documents)
"""

    sql["chunker_stride"] = f"""
WITH chunks AS ({_chunks_cte()})
SELECT doc_id, chunk_index, chunk_text FROM chunks
"""

    # UDTF twin: the Python table function must emit exactly the
    # relational chunker's rows
    sql["chunker_udtf"] = sql["chunker_stride"]

    # UDAF twin: pandas grouped-agg median == interpolated quantile
    sql["udaf_median_acctbal"] = """
SELECT c_mktsegment,
       round(quantile_cont(c_acctbal, 0.5), 6) AS median_acctbal,
       count(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
"""

    sql["chunk_metadata"] = f"""
WITH chunks AS ({_chunks_cte(extra_cols=", source")})
SELECT 'doc-' || doc_id || '-' || chunk_index AS id,
       chunk_index AS md_chunk_index,
       source AS md_source,
       2::INT AS n_keys,
       'chunk_index,source' AS md_keys
FROM chunks
"""

    sql["pipeline_vectors"] = f"""
WITH chunks AS ({_chunks_cte(extra_cols=", source")}),
emb AS (
  SELECT *, {_det_embed('chunk_text', EMBED_DIM)} AS v FROM chunks),
nrm AS (
  SELECT *, sqrt(list_sum(list_transform(v, x -> x * x))) AS n FROM emb)
SELECT 'doc-' || doc_id || '-' || chunk_index AS id,
       doc_id, chunk_index, source,
       length(chunk_text) AS chunk_chars,
       round(list_sum(list_transform(v, x -> x / n)), 6) AS emb_sum,
       round(sqrt(list_sum(list_transform(v, x -> (x / n) * (x / n)))), 6) AS emb_norm,
       round(v[1] / n, 6) AS emb_c0
FROM nrm
"""

    toks = _tokens("text")
    sql["text_stats"] = f"""
WITH base AS (
  SELECT doc_id, length(text) AS n_chars_actual,
         len({toks})::INT AS n_tokens,
         length(replace(text, ' ', '')) AS non_space,
         (length(text) - length(replace(replace(replace(replace(replace(replace(text,
             '.', ''), ',', ''), ';', ''), ':', ''), '!', ''), '?', '')))::DOUBLE
           / greatest(length(text)::DOUBLE, 1.0) AS pr
  FROM documents),
derived AS (
  SELECT *, CASE WHEN n_tokens > 0 THEN non_space::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END AS avg_len
  FROM base)
SELECT doc_id, n_chars_actual::INT AS n_chars_actual, n_tokens,
       round(avg_len, 6) AS avg_token_len,
       round(pr, 6) AS punct_ratio,
       round(least(n_tokens::DOUBLE / 20.0, 1.0) * 0.5
             + (CASE WHEN avg_len >= 3 AND avg_len <= 10 THEN 0.3 ELSE 0.0 END)
             + (CASE WHEN pr <= 0.1 THEN 0.2 ELSE 0.0 END), 6) AS quality_score
FROM derived
"""

    scores = ",\n         ".join(
        f"{_stopword_score(lang)} AS s_{lang}" for lang in LANG_MARKERS
    )
    sql["lang_id"] = f"""
WITH s AS (
  SELECT doc_id, lang,
         {scores}
  -- doubled spaces (r12 review): adjacent stopword repeats share a
  -- delimiter; expanding ' '->'  ' makes every occurrence countable
  -- by non-overlapping replace (mirrors functions.text.stopword_hits)
  FROM (SELECT doc_id, lang, ' ' || replace(text, ' ', '  ') || ' ' AS p
        FROM documents))
SELECT doc_id, lang AS lang_labeled, {_lang_case()} AS lang_guess FROM s
"""

    # empty-relation contracts (r13): the same provably-empty subsets,
    # each leg deriving its count/probe from the empty relation in
    # DuckDB's own idiom. The load-bearing rows: global_agg emits ONE
    # row (count 0, NULL sum -> '<null>'); grouped/session/window legs
    # emit ZERO rows into their count.
    sql["empty_relation_contracts"] = """
WITH d0 AS (SELECT * FROM documents WHERE doc_id < 0),
     e0 AS (SELECT * FROM events WHERE user_id < 0)
SELECT 'doc_stats' AS kernel, count(*)::BIGINT AS n_rows, '<none>' AS probe FROM d0
UNION ALL
SELECT 'language_id', count(*)::BIGINT, '<none>' FROM d0
UNION ALL
SELECT 'gram_explode', count(*)::BIGINT, '<none>'
FROM (SELECT unnest(string_split(text, ' ')) FROM d0)
UNION ALL
SELECT 'grouped_agg', count(*)::BIGINT, '<none>'
FROM (SELECT event_type, count(*) FROM e0 GROUP BY event_type)
UNION ALL
SELECT 'session_groups', count(*)::BIGINT, '<none>'
FROM (SELECT user_id, count(*) FROM e0 GROUP BY user_id)
UNION ALL
SELECT 'window_fn', count(*)::BIGINT, '<none>'
FROM (SELECT sum(value) OVER (PARTITION BY user_id ORDER BY ts) FROM e0)
UNION ALL
SELECT 'join_back', count(*)::BIGINT, '<none>'
FROM d0 JOIN documents USING (doc_id)
UNION ALL
SELECT 'global_agg', count(*)::BIGINT,
       coalesce(CAST(sum(value) AS VARCHAR), '<null>') FROM e0
"""

    # NULL-bearing-keys adversarial row (r14, VERDICT r13 item 2):
    # derive the SAME provably NULL-bearing keys from the same value
    # classes, then recompute every contract in DuckDB's idiom with
    # the placement EXPLICIT (ASC NULLS LAST / DESC NULLS FIRST — each
    # the opposite of at least one engine's default). Digests are
    # order-insensitive sums of 24-bit md5 ints over canonical row
    # strings, NULL spelled NULLKEY_NULL_TAG.
    from .queries import NULLKEY_CLASS, NULLKEY_NULL_TAG, NULLKEY_TS_MOD

    _nk = _sql_lit(NULLKEY_NULL_TAG)

    def _nkh(expr: str) -> str:
        return f"CAST(sum({_h24(expr)}) AS BIGINT)"

    sql["null_keys_contracts"] = f"""
WITH ev AS (
  SELECT event_id, user_id, ts,
         nullif(event_type, {_sql_lit(NULLKEY_CLASS)}) AS k, event_type
  FROM events),
ranked_asc AS (
  SELECT user_id, k, row_number() OVER (
    PARTITION BY user_id ORDER BY k ASC NULLS LAST, event_id) AS rn
  FROM ev),
ranked_desc AS (
  SELECT user_id, k, row_number() OVER (
    PARTITION BY user_id ORDER BY k DESC NULLS FIRST, event_id) AS rn
  FROM ev),
dim AS (SELECT k AS kd, count(*) AS cnt FROM ev GROUP BY k),
cd AS (
  SELECT user_id, event_id, k, lag(k) OVER (
    PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM ev),
purchases AS (
  SELECT event_id, user_id,
         CASE WHEN event_id % {NULLKEY_TS_MOD} = 0 THEN NULL ELSE ts END AS tsk
  FROM ev WHERE event_type = 'purchase'),
clicks AS (
  SELECT user_id, ts FROM ev WHERE event_type = {_sql_lit(NULLKEY_CLASS)}),
asof_m AS (
  SELECT p.event_id, p.tsk,
         (SELECT max(c.ts) FROM clicks c
           WHERE c.user_id = p.user_id AND c.ts <= p.tsk) AS match
  FROM purchases p)
SELECT 'window_rank_asc' AS kernel, count(*)::BIGINT AS n_rows,
       {_nkh("user_id::VARCHAR || ':' || rn::VARCHAR || ':' || coalesce(k, " + _nk + ")")} AS digest,
       count(*) FILTER (k IS NULL)::BIGINT AS nulls_touched
FROM ranked_asc
UNION ALL
SELECT 'window_rank_desc', count(*)::BIGINT,
       {_nkh("user_id::VARCHAR || ':' || rn::VARCHAR || ':' || coalesce(k, " + _nk + ")")},
       count(*) FILTER (k IS NULL)::BIGINT
FROM ranked_desc
UNION ALL
SELECT 'grouped_nulls', count(*)::BIGINT,
       {_nkh("coalesce(kd, " + _nk + ") || ':' || cnt::VARCHAR")},
       CAST(coalesce(sum(cnt) FILTER (kd IS NULL), 0) AS BIGINT)
FROM dim
UNION ALL
SELECT 'join_drop', count(*)::BIGINT,
       {_nkh("event_id::VARCHAR || ':' || cnt::VARCHAR")},
       (SELECT count(*) FILTER (k IS NULL) FROM ev)::BIGINT
FROM ev JOIN dim ON ev.k = dim.kd
UNION ALL
SELECT 'join_null_safe', count(*)::BIGINT,
       {_nkh("event_id::VARCHAR || ':' || cnt::VARCHAR")},
       count(*) FILTER (k IS NULL)::BIGINT
FROM ev JOIN dim ON ev.k IS NOT DISTINCT FROM dim.kd
UNION ALL
SELECT 'change_detect', count(*)::BIGINT,
       {_nkh("user_id::VARCHAR || ':' || event_id::VARCHAR")},
       count(*) FILTER (k IS NULL OR prev IS NULL)::BIGINT
FROM cd WHERE k IS DISTINCT FROM prev
UNION ALL
SELECT 'asof_null_key', count(*)::BIGINT,
       {_nkh("event_id::VARCHAR || ':' || coalesce(epoch_us(match::TIMESTAMP)::VARCHAR, " + _nk + ")")},
       count(*) FILTER (tsk IS NULL)::BIGINT
FROM asof_m
"""

    # float-edge adversarial row (r14): inject the SAME special values
    # by the same event_id classes, recompute every contract in
    # DuckDB's idiom. Specials stay internal — outputs are class
    # digests and counts only. DuckDB agreements certified: NaN sorts
    # greatest (after +Inf), NaN = NaN groups/joins as ONE key,
    # -0.0 = +0.0 fold to one key, sum/avg/max go NaN with a NaN
    # present while min is -Inf, and x/0.0 is NULL (the twin of
    # Spark's ANSI try_divide) while x/NaN is NaN.
    from .queries import FLOATEDGE_MOD

    _fx = f"""CASE event_id % {FLOATEDGE_MOD}
           WHEN 0 THEN 'nan'::DOUBLE
           WHEN 1 THEN 'inf'::DOUBLE
           WHEN 2 THEN '-inf'::DOUBLE
           WHEN 3 THEN (-0.0)::DOUBLE
           WHEN 4 THEN 0.0::DOUBLE
           ELSE value END"""

    def _fcls(c: str) -> str:
        return (
            f"CASE WHEN isnan({c}) THEN 'nan' "
            f"WHEN {c} = 'inf'::DOUBLE THEN 'inf' "
            f"WHEN {c} = '-inf'::DOUBLE THEN '-inf' ELSE 'fin' END"
        )

    _fspecial = "(isnan(x) OR x = 'inf'::DOUBLE OR x = '-inf'::DOUBLE)"

    sql["float_edge_contracts"] = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, {_fx} AS x FROM events),
ranked AS (
  SELECT user_id, x, row_number() OVER (
    PARTITION BY user_id ORDER BY x ASC, event_id) AS rn
  FROM ev),
grp AS (SELECT x, count(*) AS cnt FROM ev GROUP BY x),
aggd AS (
  SELECT event_type, sum(x) AS s, avg(x) AS a, max(x) AS mx, min(x) AS mn
  FROM ev GROUP BY event_type),
dim AS (
  SELECT DISTINCT x AS xd FROM ev WHERE event_id % {FLOATEDGE_MOD} <= 4),
divd AS (
  SELECT event_id,
         CASE WHEN x / (x - x) IS NULL THEN 'null'
              WHEN isnan(x / (x - x)) THEN 'nan'
              ELSE 'other' END AS qc
  FROM ev)
SELECT 'rank_total_order' AS kernel, count(*)::BIGINT AS n_rows,
       {_nkh("user_id::VARCHAR || ':' || rn::VARCHAR || ':' || " + _fcls("x"))} AS digest,
       count(*) FILTER ({_fspecial})::BIGINT AS specials_touched
FROM ranked
UNION ALL
SELECT 'group_fold', count(*)::BIGINT,
       {_nkh(_fcls("x") + " || ':' || cnt::VARCHAR")},
       CAST(coalesce(sum(cnt) FILTER ({_fspecial}), 0) AS BIGINT)
FROM grp
UNION ALL
SELECT 'agg_propagation', count(*)::BIGINT,
       {_nkh("event_type || ':' || " + _fcls("s") + " || ':' || " + _fcls("a") + " || ':' || " + _fcls("mx") + " || ':' || " + _fcls("mn"))},
       count(*) FILTER (isnan(s))::BIGINT
FROM aggd
UNION ALL
SELECT 'join_special_keys', count(*)::BIGINT,
       {_nkh("event_id::VARCHAR || ':' || " + _fcls("x"))},
       count(*) FILTER ({_fspecial})::BIGINT
FROM ev JOIN dim ON ev.x = dim.xd
UNION ALL
SELECT 'div_zero_null', count(*)::BIGINT,
       {_nkh("event_id::VARCHAR || ':' || qc")},
       count(*) FILTER (qc = 'nan')::BIGINT
FROM divd
"""

    # overflow/precision adversarial row (r15, VERDICT r14 item 2):
    # rebuild the SAME injected near-boundary classes from the same
    # constants, then recompute every contract in DuckDB's idiom —
    # HUGEINT is the exact wide type (every injected sum/product fits
    # in 127 bits), so try_sum/try_multiply NULL-on-overflow is an
    # explicit BETWEEN range CASE, the decimal-routed legs are HUGEINT
    # arithmetic rendered as the same plain-integer strings, and
    # trunc-toward-zero is spelled trunc()+cast because DuckDB's bare
    # DOUBLE->BIGINT cast ROUNDS half-to-even while its DECIMAL cast
    # rounds half-away (two behaviors in one engine; Spark's ANSI cast
    # truncates — all measured in tests/test_overflow_edges.py).
    from .queries import (
        OVFL_BIGMAX,
        OVFL_CLASS_MOD,
        OVFL_GROUP_CUT,
        OVFL_GROUP_MOD,
        OVFL_JITTER_MOD,
        OVFL_NULL_TAG,
    )

    _ot = _sql_lit(OVFL_NULL_TAG)
    _opos = (
        f"(event_id % {OVFL_CLASS_MOD} = 0 AND "
        f"event_id % {OVFL_GROUP_MOD} < {OVFL_GROUP_CUT})"
    )
    _orange = f"BETWEEN -{OVFL_BIGMAX} - 1 AND {OVFL_BIGMAX}"

    def _oh(expr: str) -> str:
        return f"CAST(sum({_h24(expr)}) AS BIGINT)"

    sql["overflow_precision_contracts"] = f"""
WITH ev AS (
  SELECT event_id, event_type,
    CASE WHEN {_opos}
         THEN {OVFL_BIGMAX} - (event_id % {OVFL_JITTER_MOD})
         ELSE event_id * 1000 + 7 END AS big_pos,
    CASE WHEN {_opos}
         THEN {OVFL_BIGMAX} - (event_id % {OVFL_JITTER_MOD})
         WHEN event_id % {OVFL_CLASS_MOD} = 1
         THEN -{OVFL_BIGMAX} + (event_id % {OVFL_JITTER_MOD})
         ELSE event_id * 1000 + 7 END AS big_mix,
    CASE WHEN event_id % {OVFL_CLASS_MOD} = 2
         THEN 1.0e10 + event_id::DOUBLE
         ELSE event_id::DOUBLE END AS d_big,
    (event_id - 500)::DOUBLE + (event_id % 4)::DOUBLE * 0.25 AS d_frac,
    (event_id % 2000 - 1000)::VARCHAR || '.' ||
      lpad((event_id % 100)::VARCHAR, 2, '0') || '50' AS dec_str,
    {_opos} AS is_pos,
    (event_id % {OVFL_CLASS_MOD} = 1) AS is_neg,
    (event_id % 4 = 2) AS is_tie
  FROM events),
sdec AS (
  SELECT event_type, sum(CAST(big_mix AS HUGEINT)) AS s,
         count(*) FILTER (is_pos OR is_neg) AS nb
  FROM ev GROUP BY event_type),
tsum AS (
  SELECT event_id % {OVFL_GROUP_MOD} AS g,
         sum(CAST(big_pos AS HUGEINT)) AS hs,
         count(*) FILTER (is_pos) AS nb
  FROM ev GROUP BY event_id % {OVFL_GROUP_MOD}),
mul AS (
  SELECT event_id, is_pos, CAST(big_pos AS HUGEINT) * 3 AS hp FROM ev),
cst AS (
  SELECT event_id, TRY_CAST(d_big AS INTEGER) AS c FROM ev),
frac AS (
  SELECT event_id, is_tie,
         CAST(round(d_frac, 0) AS BIGINT) AS rr,
         CAST(trunc(d_frac) AS BIGINT) AS tt
  FROM ev),
dtie AS (
  SELECT event_id,
         CAST(round(CAST(dec_str AS DECIMAL(20,4)), 2) AS VARCHAR) AS r2
  FROM ev)
SELECT 'sum_decimal_route' AS kernel, count(*)::BIGINT AS n_rows,
       {_oh("event_type || ':' || s::VARCHAR")} AS digest,
       CAST(sum(nb) AS BIGINT) AS boundary_rows
FROM sdec
UNION ALL
SELECT 'try_sum_null_on_overflow', count(*)::BIGINT,
       {_oh("g::VARCHAR || ':' || coalesce((CASE WHEN hs " + _orange + " THEN CAST(hs AS BIGINT) END)::VARCHAR, " + _ot + ")")},
       CAST(sum(nb) AS BIGINT)
FROM tsum
UNION ALL
SELECT 'mul_try_null', count(*)::BIGINT,
       {_oh("event_id::VARCHAR || ':' || coalesce((CASE WHEN hp " + _orange + " THEN CAST(hp AS BIGINT) END)::VARCHAR, " + _ot + ")")},
       count(*) FILTER (NOT (hp {_orange}))::BIGINT
FROM mul
UNION ALL
SELECT 'mul_decimal_exact', count(*)::BIGINT,
       {_oh("event_id::VARCHAR || ':' || hp::VARCHAR")},
       count(*) FILTER (is_pos)::BIGINT
FROM mul
UNION ALL
SELECT 'cast_range_null', count(*)::BIGINT,
       {_oh("event_id::VARCHAR || ':' || coalesce(c::VARCHAR, " + _ot + ")")},
       count(*) FILTER (c IS NULL)::BIGINT
FROM cst
UNION ALL
SELECT 'cast_fraction_contracts', count(*)::BIGINT,
       {_oh("event_id::VARCHAR || ':' || rr::VARCHAR || ':' || tt::VARCHAR")},
       count(*) FILTER (is_tie)::BIGINT
FROM frac
UNION ALL
SELECT 'decimal_tie_round', count(*)::BIGINT,
       {_oh("event_id::VARCHAR || ':' || r2")},
       count(*)::BIGINT
FROM dtie
"""

    # Unicode case/collation adversarial row (r15, second row): rebuild
    # the SAME augmented input from the same template constants, then
    # spell each JVM-divergent kernel in utf8proc's idiom — expand the
    # full case mappings (ß/ﬁ/ﬂ) BEFORE upper() because utf8proc maps
    # 1:1 where the JVM grows the string; decompose İ before lower()
    # (utf8proc drops the dot, the JVM emits i + U+0307); rewrite
    # word-final σ -> ς with a sentinel space (DuckDB has no
    # final-sigma context rule; valid because no augmented text ends
    # with a space and every σ is preceded by a letter — template
    # invariants asserted by tests/test_unicode_case.py). initcap does
    # not exist in DuckDB: split/transform/join on single spaces (the
    # corpus has no tab/CR/LF, measured in the pin). The agree legs
    # (code-point metrics, reverse on combining-free classes, binary
    # collation rank, raw-ASCII casing) are the SAME kernel raw in
    # both engines.
    from .queries import (
        UNICASE_DOCS,
        UNICASE_ORD_PAD,
        UNICASE_PREFIX_CHARS,
        UNICASE_TEMPLATES,
    )

    _un = len(UNICASE_TEMPLATES)
    _utmpl = (
        f"CASE (doc_id % {_un}) "
        + " ".join(
            f"WHEN {i} THEN {_sql_lit(t)}"
            for i, t in enumerate(UNICASE_TEMPLATES[:-1])
        )
        + f" ELSE {_sql_lit(UNICASE_TEMPLATES[-1])} END"
    )

    def _uh(expr: str) -> str:
        return f"CAST(sum({_h24(expr)}) AS BIGINT)"

    _ufold = (
        f"upper(replace(replace(replace(s, {_sql_lit('ß')}, 'ss'), "
        f"{_sql_lit('ﬁ')}, 'fi'), {_sql_lit('ﬂ')}, 'fl'))"
    )
    _ulower = (
        f"rtrim(replace(lower(replace(s, {_sql_lit('İ')}, "
        f"{_sql_lit('I' + chr(0x0307))})) || ' ', "
        f"{_sql_lit(chr(0x03C3) + ' ')}, {_sql_lit(chr(0x03C2) + ' ')}), ' ')"
    )
    _uinitcap = (
        "array_to_string(list_transform(string_split(prefix, ' '), "
        "w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))), ' ')"
    )
    _uemoji = _sql_lit("\U0001f600")

    sql["unicode_case_contracts"] = f"""
WITH aug AS (
  SELECT doc_id, text, (doc_id % {_un})::INT AS cls,
         substr(text, 1, {UNICASE_PREFIX_CHARS}) AS prefix,
         substr(text, 1, {UNICASE_PREFIX_CHARS}) || ' ' || {_utmpl} AS s,
         {_utmpl} || '#' ||
           lpad(doc_id::VARCHAR, {UNICASE_ORD_PAD}, '0') AS sort_key
  FROM documents WHERE doc_id < {UNICASE_DOCS}),
ranked AS (
  SELECT doc_id, cls, row_number() OVER (ORDER BY sort_key) AS rk FROM aug)
SELECT 'upper_fold_expansion' AS kernel, count(*)::BIGINT AS n_rows,
       {_uh("doc_id::VARCHAR || ':' || " + _ufold)} AS digest,
       count(*) FILTER (cls = 0)::BIGINT AS marked_rows
FROM aug
UNION ALL
SELECT 'lower_idot_sigma', count(*)::BIGINT,
       {_uh("doc_id::VARCHAR || ':' || " + _ulower)},
       count(*) FILTER (cls IN (1, 2))::BIGINT
FROM aug
UNION ALL
SELECT 'ascii_casing_agree', count(*)::BIGINT,
       {_uh("doc_id::VARCHAR || ':' || upper(text) || ':' || lower(text)")},
       count(*) FILTER (strlen(text) <> length(text))::BIGINT
FROM aug
UNION ALL
SELECT 'codepoint_metrics', count(*)::BIGINT,
       {_uh("doc_id::VARCHAR || ':' || length(s)::VARCHAR || ':' || "
            f"substr(s, {UNICASE_PREFIX_CHARS + 2}, 9) || ':' || "
            "strpos(s, 'n')::VARCHAR || ':' || "
            f"strpos(s, {_uemoji})::VARCHAR")},
       count(*) FILTER (strlen(s) <> length(s))::BIGINT
FROM aug
UNION ALL
SELECT 'reverse_codepoint_agree', count(*)::BIGINT,
       {_uh("doc_id::VARCHAR || ':' || reverse(s)")},
       count(*) FILTER (cls = 5)::BIGINT
FROM aug WHERE cls <> 4
UNION ALL
SELECT 'binary_order_rank', count(*)::BIGINT,
       {_uh("doc_id::VARCHAR || ':' || rk::VARCHAR")},
       count(*) FILTER (cls = 5)::BIGINT
FROM ranked
UNION ALL
SELECT 'initcap_ascii', count(*)::BIGINT,
       {_uh("doc_id::VARCHAR || ':' || " + _uinitcap)},
       count(*) FILTER ({_uinitcap} <> prefix)::BIGINT
FROM aug
"""

    # hostile-text adversarial row (r13, VERDICT r12 item 4): rebuild
    # the SAME augmented input from the same template constants, then
    # recompute every kernel in DuckDB's own idiom. Templates carry
    # real tabs/newlines/multibyte inside standard SQL string literals.
    from .queries import (
        HOSTILE_DOCS,
        HOSTILE_PREFIX_CHARS,
        HOSTILE_TEMPLATES,
    )
    from .functions.text import BPE_TOKEN_RE

    tmpl_case = (
        f"CASE (doc_id % {len(HOSTILE_TEMPLATES)}) "
        + " ".join(
            f"WHEN {i} THEN {_sql_lit(t)}"
            for i, t in enumerate(HOSTILE_TEMPLATES[:-1])
        )
        + f" ELSE {_sql_lit(HOSTILE_TEMPLATES[-1])} END"
    )
    _strip = "text"
    for ch in ".,;:!?":
        _strip = f"replace({_strip}, '{ch}', '')"
    _char3 = (
        "CASE WHEN length(text) < 3 THEN [text] ELSE "
        "list_transform(range(1, length(text) - 2 + 1), "
        "i -> substr(text, i::INT, 3)) END"
    )
    _grams2 = (
        f"list_transform(range(1, greatest(len({toks}) - 1, 1) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + 1), ' '))"
    )
    sql["hostile_text_tokens"] = f"""
WITH aug AS (
  SELECT doc_id,
         substr(text, 1, {HOSTILE_PREFIX_CHARS}) || ' ' || {tmpl_case} AS text
  FROM documents WHERE doc_id < {HOSTILE_DOCS}),
padded AS (
  SELECT doc_id, text, ' ' || replace(text, ' ', '  ') || ' ' AS p FROM aug)
SELECT doc_id,
       len({toks})::INT AS n_tok,
       md5(array_to_string({toks}, '|')) AS tok_digest,
       len(regexp_extract_all(text, {_sql_lit(BPE_TOKEN_RE)}))::INT AS n_bpe,
       {_stopword_score('en')} AS hits_en,
       {_stopword_score('de')} AS hits_de,
       round((length(text) - length({_strip}))::DOUBLE
             / greatest(length(text), 1)::DOUBLE, 6) AS punct_r,
       len({_char3})::INT AS n_char3,
       md5(array_to_string({_char3}, '|')) AS char3_digest,
       md5(array_to_string({_grams2}, '|')) AS gram2_digest
FROM padded
"""

    sql["corpus_stats"] = f"""
SELECT lang, source, count(*) AS n_docs,
       SUM(len({toks})::INT)::BIGINT AS total_tokens,
       SUM(length(text))::BIGINT AS total_chars,
       MAX(length(text))::INT AS max_chars
FROM documents GROUP BY lang, source
"""

    sql["doc_fingerprints"] = f"""
WITH hashed AS (
  SELECT doc_id, text, {_element_hashes(_tokens('text'))} AS hs FROM documents)
SELECT doc_id,
       ('0x' || substr(md5(text), 1, 12))::BIGINT AS content_fp48,
       {_simhash16('hs')} AS simhash16
FROM hashed
"""

    # Gopher repetition filters: integer gram counts / integer char
    # lengths -> every fraction is the same exact double division in
    # both engines; the pass gate compares those doubles to literal
    # thresholds, so it cannot straddle a rounding boundary.
    # coalesce(...,0) on the token counts (r12, ADVICE r11): DuckDB's
    # len(string_split(NULL)) is NULL, so a NULL-text doc scored
    # n_words=NULL -> uniq NULL -> gate NULL here while the Spark
    # kernel clamps to 0 and FAILS the doc. Latent on the fixtures (no
    # NULL-text docs); pinned by
    # tests/test_validation_text.py::test_gopher_oracle_judges_null_text_docs.
    sql["gopher_quality"] = f"""
WITH base AS (
  SELECT doc_id, length(text) AS n_chars,
         coalesce(len({toks})::INT, 0) AS n_words,
         coalesce(len(list_distinct({toks})), 0) AS n_unique
  FROM documents),
ctop AS (
  SELECT doc_id, gram, count(*) AS cnt
  FROM (SELECT doc_id, unnest({_word_ngrams('text', GOPHER_TOP_N, drop_empty=True)}) AS gram
        FROM documents)
  GROUP BY doc_id, gram),
top AS (SELECT doc_id, max(cnt * length(gram))::BIGINT AS top_chars
        FROM ctop GROUP BY doc_id),
cdup AS (
  SELECT doc_id, gram, count(*) AS cnt
  FROM (SELECT doc_id, unnest({_word_ngrams('text', GOPHER_DUP_N, drop_empty=True)}) AS gram
        FROM documents)
  GROUP BY doc_id, gram),
dup AS (SELECT doc_id,
               SUM(CASE WHEN cnt >= 2 THEN cnt * length(gram) ELSE 0 END)::BIGINT
                 AS dup_chars
        FROM cdup GROUP BY doc_id),
j AS (
  -- LEFT joins + zero fills mirror the Spark kernel (r11 review): a
  -- zero-token doc has no grams but must still be judged by the gate
  SELECT b.doc_id, b.n_words,
         b.n_unique::DOUBLE / greatest(b.n_words, 1)::DOUBLE AS uniq,
         coalesce(t.top_chars, 0)::DOUBLE
           / greatest(b.n_chars, 1)::DOUBLE AS topf,
         coalesce(d.dup_chars, 0)::DOUBLE
           / greatest(b.n_chars, 1)::DOUBLE AS dupf
  FROM base b LEFT JOIN top t USING (doc_id) LEFT JOIN dup d USING (doc_id))
SELECT doc_id, n_words,
       round(uniq, 6) AS unique_word_frac,
       round(topf, 6) AS top{GOPHER_TOP_N}gram_char_frac,
       round(dupf, 6) AS dup{GOPHER_DUP_N}gram_char_frac,
       (uniq >= {GOPHER_MIN_UNIQUE} AND topf <= {GOPHER_MAX_TOP2}
        AND dupf <= {GOPHER_MAX_DUP3}) AS passes_repetition
FROM j
"""

    sql["crossdoc_spans"] = f"""
WITH g AS (
  SELECT doc_id, unnest({_word_ngrams('text', CROSSDOC_NGRAM, drop_empty=True)}) AS gram
  FROM documents),
pd AS (SELECT gram, doc_id, count(*) AS n_occ FROM g GROUP BY gram, doc_id),
gd AS (SELECT gram, count(*) AS n_docs FROM pd GROUP BY gram),
per AS (
  SELECT doc_id, SUM(n_occ)::BIGINT AS n_grams,
         SUM(CASE WHEN n_docs >= {CROSSDOC_MIN_DOCS} THEN n_occ ELSE 0 END)::BIGINT
           AS dup_grams
  FROM pd JOIN gd USING (gram) GROUP BY doc_id)
SELECT doc_id, n_grams, dup_grams,
       round(dup_grams::DOUBLE / n_grams::DOUBLE, 6) AS dup_span_frac,
       (dup_grams::DOUBLE / n_grams::DOUBLE) >= {CROSSDOC_FLAG_FRAC}
         AS is_boilerplate
FROM per
"""

    # hybrid RRF: both legs and the fusion replayed from scratch.
    # kw_score routes per-term 6dp-rounded tfidf through exact decimal
    # sum (order-free); vec_score is the raw-component cosine (same
    # double fold as _det_embed/_cos); rrf adds the two reciprocal
    # terms in fixed kw-then-vec expression order in both engines.
    from .queries import QUERY_TEXT as _QT

    hq_terms = ", ".join(f"'{t}'" for t in sorted(set(_QT.split())))
    hq_lit = _vec_literal(det_components_py(_QT, EMBED_DIM))
    sql["hybrid_search_rrf"] = f"""
WITH dt AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents),
qt AS (SELECT doc_id, term, count(*) AS tf FROM dt
       WHERE term IN ({hq_terms}) GROUP BY doc_id, term),
dft AS (SELECT term, count(*) AS df FROM qt GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
kw AS (SELECT doc_id,
              CAST(SUM(CAST(round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6)
                            AS {DEC})) AS DOUBLE) AS kw_score
       FROM qt JOIN dft USING (term) CROSS JOIN n GROUP BY doc_id),
kwl AS (SELECT doc_id, kw_rank FROM (
          SELECT doc_id,
                 row_number() OVER (ORDER BY kw_score DESC, doc_id)::INT AS kw_rank
          FROM kw) WHERE kw_rank <= {HYBRID_LEG_K}),
emb AS (SELECT doc_id, {_det_embed('text', EMBED_DIM)} AS v FROM documents),
vsc AS (SELECT doc_id, round({_cos('v', 'hq_lit_v', EMBED_DIM)}, 6) AS vec_score
        FROM (SELECT doc_id, v, {hq_lit} AS hq_lit_v FROM emb)),
vl AS (SELECT doc_id, vec_rank FROM (
         SELECT doc_id,
                row_number() OVER (ORDER BY vec_score DESC, doc_id)::INT AS vec_rank
         FROM vsc) WHERE vec_rank <= {HYBRID_LEG_K}),
fused AS (
  SELECT coalesce(kwl.doc_id, vl.doc_id) AS doc_id, kwl.kw_rank, vl.vec_rank
  FROM kwl FULL OUTER JOIN vl ON kwl.doc_id = vl.doc_id),
scored AS (
  SELECT doc_id, kw_rank, vec_rank,
         round((CASE WHEN kw_rank IS NOT NULL
                     THEN 1.0 / ({RRF_KCONST} + kw_rank) ELSE 0.0 END)
               + (CASE WHEN vec_rank IS NOT NULL
                       THEN 1.0 / ({RRF_KCONST} + vec_rank) ELSE 0.0 END),
               6) AS rrf_score
  FROM fused)
SELECT doc_id, kw_rank, vec_rank, rrf_score,
       row_number() OVER (ORDER BY rrf_score DESC, doc_id)::INT AS fused_rank
FROM scored QUALIFY fused_rank <= {HYBRID_K}
"""

    # mixture sampling: every decision is integer hash arithmetic, so
    # the oracle replays the whole plan (rates, cap rank, epochs)
    rate_case = " ".join(
        f"WHEN '{s}' THEN {r}" for s, r in MIX_RATES.items()
    )
    rep_case = " ".join(f"WHEN '{s}' THEN {r}" for s, r in MIX_REPEATS.items())
    mix_bucket = f"('0x' || substr(md5('{MIX_SALT}' || doc_id), 1, 6))::BIGINT % 100"
    sql["mixture_sample"] = f"""
WITH base AS (
  SELECT doc_id, source,
         ({mix_bucket})::INT AS sample_bucket,
         CASE source {rate_case} ELSE {MIX_DEFAULT_RATE} END AS rate,
         CASE source {rep_case} ELSE 1 END AS n_epochs
  FROM documents),
capped AS (
  SELECT doc_id, source, sample_bucket, n_epochs,
         row_number() OVER (PARTITION BY source
                            ORDER BY sample_bucket, doc_id)::INT AS rank_in_source
  FROM base WHERE sample_bucket < rate)
SELECT doc_id, source, sample_bucket, rank_in_source,
       unnest(range(1, n_epochs + 1))::INT AS epoch
FROM capped WHERE rank_in_source <= {MIX_CAP}
"""

    # int8 quantization twin: identical double arithmetic; DuckDB's
    # round() on doubles is half-away-from-zero == Spark's HALF_UP
    sql["embed_quantize"] = f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         greatest(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))),
                  1e-12) / 127.0 AS scale
  FROM embeddings),
q AS (
  SELECT vec_id, v, scale,
         list_transform(v,
           x -> least(greatest(round(x / scale), -127.0), 127.0)::INT) AS qv
  FROM base)
SELECT vec_id,
       round(scale, 9) AS scale,
       list_sum(qv)::BIGINT AS q_sum,
       list_min(qv)::INT AS q_min,
       list_max(qv)::INT AS q_max,
       round(list_max(list_transform(range(1, {EMBED_DIM + 1}),
             i -> abs(qv[i]::DOUBLE * scale - v[i]))), 9) AS max_abs_err
FROM q
"""

    # curation family (operators/curation.py — regexes chosen to parse
    # identically under Java regex and RE2; DuckDB regexp_replace needs
    # the explicit 'g' flag to match Spark's replace-all default)
    from .operators.curation import EMAIL_RE, PHONE_RE
    from .queries import CONTAM_NGRAM, PACK_BUDGET, PACK_GROUPS

    email_sql = EMAIL_RE  # single-quoted SQL strings keep backslashes raw
    sql["pii_scrub"] = f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN
           text || ' contact user' || doc_id::VARCHAR || '@example.com or 555-0142'
         ELSE text END AS text
  FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{email_sql}', '<EMAIL>', 'g'),
                      '{PHONE_RE}', '<PHONE>', 'g') AS clean_text,
       (len(regexp_extract_all(text, '{email_sql}'))
        + len(regexp_extract_all(text, '{PHONE_RE}')))::INT AS n_redactions,
       len(regexp_extract_all(text, '{email_sql}'))::INT AS n_emails,
       len(regexp_extract_all(text, '{PHONE_RE}'))::INT AS n_phones
FROM aug
"""

    sql["pack_sequences"] = f"""
WITH base AS (
  SELECT doc_id, doc_id % {PACK_GROUPS} AS pack_group,
         len({toks})::INT AS n_tokens
  FROM documents),
w AS (
  SELECT *, coalesce(SUM(n_tokens) OVER (
      PARTITION BY pack_group ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM base)
SELECT doc_id, pack_group, n_tokens,
       (before // {PACK_BUDGET})::INT AS pack_id,
       ((before % {PACK_BUDGET}) + n_tokens > {PACK_BUDGET}) AS overflowed
FROM w
"""

    sql["contamination_check"] = f"""
WITH bench AS (
  SELECT doc_id + 500000 AS doc_id,
         substr(text, 1, (length(text) // 2)::INT) AS text
  FROM documents WHERE doc_id % 97 = 0),
cg AS (
  SELECT doc_id AS corpus_doc, unnest({_word_ngrams('text', CONTAM_NGRAM, drop_empty=True)}) AS gram
  FROM documents),
bg AS (
  SELECT DISTINCT doc_id AS bench_doc, gram FROM (
    SELECT doc_id, unnest({_word_ngrams('text', CONTAM_NGRAM, drop_empty=True)}) AS gram FROM bench))
SELECT cg.corpus_doc, bg.bench_doc,
       count(DISTINCT cg.gram) AS n_shared_grams
FROM cg JOIN bg ON cg.gram = bg.gram
GROUP BY cg.corpus_doc, bg.bench_doc
"""

    # MERGE twin: left-join applies update/delete to matched target
    # rows, anti-join supplies the inserts — the read-side rewrite a
    # lakehouse MERGE executes internally.
    sql["merge_parts"] = """
WITH src AS (
  SELECT p_partkey, p_name, p_brand, p_type,
         p_size + 1 AS p_size, p_retailprice + 1.0 AS p_retailprice
  FROM part WHERE p_partkey % 3 = 0
  UNION ALL
  SELECT p_partkey + 1000000 AS p_partkey, 'NEW ' || p_name AS p_name,
         p_brand, p_type, p_size, p_retailprice
  FROM part WHERE p_partkey % 10 = 0),
upd AS (
  SELECT t.p_partkey, t.p_name, t.p_brand, t.p_type,
         CASE WHEN s.p_partkey IS NOT NULL THEN s.p_size ELSE t.p_size END AS p_size,
         CASE WHEN s.p_partkey IS NOT NULL THEN s.p_retailprice ELSE t.p_retailprice END AS p_retailprice,
         (s.p_partkey IS NOT NULL AND s.p_size % 7 = 0) AS __del
  FROM part t LEFT JOIN src s ON t.p_partkey = s.p_partkey),
ins AS (
  SELECT s.* FROM src s ANTI JOIN part t ON s.p_partkey = t.p_partkey)
SELECT p_partkey, p_name, p_brand, p_type, p_size::INT AS p_size, p_retailprice
FROM upd WHERE NOT __del
UNION ALL
SELECT p_partkey, p_name, p_brand, p_type, p_size::INT AS p_size, p_retailprice
FROM ins
"""

    sql["dedup_exact"] = """
SELECT sha256(text) AS content_hash,
       MIN(doc_id) AS kept_doc_id,
       count(*) AS dup_count
FROM documents GROUP BY sha256(text)
"""

    mh_cols = ", ".join(
        f"minhash[{k + 1}]::BIGINT AS mh{k:02d}" for k in range(MINHASH_HASHES)
    )
    sql["minhash_signatures"] = f"""
WITH hashed AS (
  SELECT doc_id, {_element_hashes(_ngrams('text', NGRAM))} AS hs FROM documents),
sigs AS (
  SELECT doc_id, {_minhash_from_hashes('hs', MINHASH_HASHES)} AS minhash FROM hashed)
SELECT doc_id, {mh_cols}
FROM sigs
"""

    rows_per_band = MINHASH_HASHES // MINHASH_BANDS
    est = (
        f"list_sum(list_transform(range(1, {MINHASH_HASHES + 1}), "
        f"i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END))::DOUBLE / {float(MINHASH_HASHES)}"
    )
    sql["neardup_minhash"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         substr(text, 1, length(text) - {NEARDUP_TRUNC}) AS text
  FROM documents),
hashed AS (SELECT doc_id, {_element_hashes(_ngrams('text', NGRAM))} AS hs FROM corpus),
sigs AS (SELECT doc_id, {_minhash_from_hashes('hs', MINHASH_HASHES)} AS sig FROM hashed),
banded AS (
  SELECT doc_id, sig, b::INT AS band_index,
         list_slice(sig, b * {rows_per_band} + 1, (b + 1) * {rows_per_band}) AS band_sig
  FROM (SELECT doc_id, sig, unnest(range(0, {MINHASH_BANDS})) AS b FROM sigs)),
pairs AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b, l.sig AS sig_a, r.sig AS sig_b
  FROM banded l JOIN banded r
    ON l.band_index = r.band_index AND l.band_sig = r.band_sig AND l.doc_id < r.doc_id)
SELECT id_a, id_b, {est} AS jaccard_est
FROM pairs WHERE {est} >= 0.5
"""

    # Incremental twin: corpus signed once, batch signed fresh, banded
    # batch JOIN banded corpus (never a self-join of the union) — the
    # SQL recomputes both signature sets from scratch, so the Spark
    # side's persisted-store read must be bit-identical to a rebuild.
    sql["dedup_incremental"] = f"""
WITH batch AS (
  SELECT doc_id + 300000 AS doc_id,
         substr(text, 1, length(text) - {NEARDUP_TRUNC}) AS text
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 400000 AS doc_id, reverse(text) AS text
  FROM documents WHERE doc_id % 5 = 1),
csigs AS (
  SELECT doc_id, {_minhash_from_hashes('hs', MINHASH_HASHES)} AS sig FROM (
    SELECT doc_id, {_element_hashes(_ngrams('text', NGRAM))} AS hs FROM documents)),
bsigs AS (
  SELECT doc_id, {_minhash_from_hashes('hs', MINHASH_HASHES)} AS sig FROM (
    SELECT doc_id, {_element_hashes(_ngrams('text', NGRAM))} AS hs FROM batch)),
cbanded AS (
  SELECT doc_id, sig, b::INT AS band_index,
         list_slice(sig, b * {rows_per_band} + 1, (b + 1) * {rows_per_band}) AS band_sig
  FROM (SELECT doc_id, sig, unnest(range(0, {MINHASH_BANDS})) AS b FROM csigs)),
bbanded AS (
  SELECT doc_id, sig, b::INT AS band_index,
         list_slice(sig, b * {rows_per_band} + 1, (b + 1) * {rows_per_band}) AS band_sig
  FROM (SELECT doc_id, sig, unnest(range(0, {MINHASH_BANDS})) AS b FROM bsigs)),
pairs AS (
  SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id,
         b.sig AS sig_a, c.sig AS sig_b
  FROM bbanded b JOIN cbanded c
    ON b.band_index = c.band_index AND b.band_sig = c.band_sig),
matches AS (
  SELECT batch_id, corpus_id, {est} AS jaccard_est
  FROM pairs WHERE {est} >= 0.5),
agg AS (
  SELECT batch_id, count(*)::BIGINT AS n_matches, max(jaccard_est) AS best_est
  FROM matches GROUP BY batch_id)
SELECT b.doc_id AS batch_id,
       coalesce(a.n_matches, 0)::BIGINT AS n_matches,
       round(coalesce(a.best_est, 0.0), 6) AS best_est,
       coalesce(a.n_matches, 0) > 0 AS is_dup
FROM batch b LEFT JOIN agg a ON b.doc_id = a.batch_id
"""

    # Fixpoint twin: the Spark side runs alternating large/small-star
    # contraction to convergence, whose fixpoint is the MIN id per
    # connected component of the shared-bucket graph — computed here
    # exactly via a recursive CTE over per-bucket star edges
    # (doc <-> bucket-min doc; star edges preserve connectivity with
    # O(n * bands) edges instead of O(bucket²) cliques). WORD shingles,
    # matching the Spark side.
    sql["neardup_groups"] = f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         substr(text, 1, length(text) - {NEARDUP_TRUNC}) AS text
  FROM documents),
hashed AS (SELECT doc_id, {_element_hashes(_word_ngrams('text', WORD_NGRAM))} AS hs FROM corpus),
sigs AS (SELECT doc_id, {_minhash_from_hashes('hs', MINHASH_HASHES)} AS sig FROM hashed),
banded AS (
  SELECT doc_id, b::INT AS band_index,
         list_slice(sig, b * {rows_per_band} + 1, (b + 1) * {rows_per_band}) AS band_sig
  FROM (SELECT doc_id, sig, unnest(range(0, {MINHASH_BANDS})) AS b FROM sigs)),
star AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY band_index, band_sig) AS bmin
  FROM banded),
edges AS (
  SELECT DISTINCT doc_id AS src, bmin AS dst FROM star WHERE doc_id <> bmin
  UNION
  SELECT DISTINCT bmin AS src, doc_id AS dst FROM star WHERE doc_id <> bmin),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id AS r FROM sigs
  UNION
  SELECT reach.doc_id, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src)
SELECT doc_id, MIN(r)::BIGINT AS group_rep FROM reach GROUP BY doc_id
"""

    # dedup capstone: groups via the same recursive-CTE connected
    # components, then the survivor rule (max tokens, ties to min id)
    sql["dedup_pipeline"] = f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         substr(text, 1, length(text) - {NEARDUP_TRUNC}) AS text
  FROM documents),
hashed AS (SELECT doc_id, {_element_hashes(_word_ngrams('text', WORD_NGRAM))} AS hs FROM corpus),
sigs AS (SELECT doc_id, {_minhash_from_hashes('hs', MINHASH_HASHES)} AS sig FROM hashed),
banded AS (
  SELECT doc_id, b::INT AS band_index,
         list_slice(sig, b * {rows_per_band} + 1, (b + 1) * {rows_per_band}) AS band_sig
  FROM (SELECT doc_id, sig, unnest(range(0, {MINHASH_BANDS})) AS b FROM sigs)),
star AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY band_index, band_sig) AS bmin
  FROM banded),
edges AS (
  SELECT DISTINCT doc_id AS src, bmin AS dst FROM star WHERE doc_id <> bmin
  UNION
  SELECT DISTINCT bmin AS src, doc_id AS dst FROM star WHERE doc_id <> bmin),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id AS r FROM sigs
  UNION
  SELECT reach.doc_id, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src),
groups AS (SELECT doc_id, MIN(r)::BIGINT AS group_rep FROM reach GROUP BY doc_id),
toks AS (SELECT doc_id, len({_tokens('text')})::INT AS n_tokens FROM corpus),
j AS (SELECT g.group_rep, g.doc_id, t.n_tokens
      FROM groups g JOIN toks t ON g.doc_id = t.doc_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY group_rep ORDER BY n_tokens DESC, doc_id ASC) AS rn
  FROM j)
SELECT group_rep,
       count(*) AS n_members,
       max(CASE WHEN rn = 1 THEN doc_id END) AS survivor_doc,
       max(n_tokens) AS survivor_tokens,
       count(*) - 1 AS n_dropped
FROM ranked GROUP BY group_rep
"""

    # capstone twin: the ENTIRE curation chain from scratch — CC
    # groups (recursive CTE), survivor rule, quality gate, PII scrub,
    # clean-text token count, pack assignment — so the Spark side's
    # persisted-store reuse and operator composition must reproduce
    # every intermediate semantics exactly
    from .queries import QUALITY_MIN

    sql["curation_pipeline"] = f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         substr(text, 1, length(text) - {NEARDUP_TRUNC}) AS text
  FROM documents),
hashed AS (SELECT doc_id, {_element_hashes(_word_ngrams('text', WORD_NGRAM))} AS hs FROM corpus),
sigs AS (SELECT doc_id, {_minhash_from_hashes('hs', MINHASH_HASHES)} AS sig FROM hashed),
banded AS (
  SELECT doc_id, b::INT AS band_index,
         list_slice(sig, b * {rows_per_band} + 1, (b + 1) * {rows_per_band}) AS band_sig
  FROM (SELECT doc_id, sig, unnest(range(0, {MINHASH_BANDS})) AS b FROM sigs)),
star AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY band_index, band_sig) AS bmin
  FROM banded),
edges AS (
  SELECT DISTINCT doc_id AS src, bmin AS dst FROM star WHERE doc_id <> bmin
  UNION
  SELECT DISTINCT bmin AS src, doc_id AS dst FROM star WHERE doc_id <> bmin),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id AS r FROM sigs
  UNION
  SELECT reach.doc_id, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src),
cgroups AS (SELECT doc_id, MIN(r)::BIGINT AS group_rep FROM reach GROUP BY doc_id),
ctoks AS (SELECT doc_id, len({_tokens('text')})::INT AS n_tokens FROM corpus),
ranked AS (
  SELECT g.group_rep, g.doc_id,
         row_number() OVER (
           PARTITION BY g.group_rep ORDER BY t.n_tokens DESC, g.doc_id ASC) AS rn
  FROM cgroups g JOIN ctoks t ON g.doc_id = t.doc_id),
surv AS (
  SELECT c.doc_id, c.text FROM corpus c
  JOIN ranked r ON c.doc_id = r.doc_id AND r.rn = 1),
qbase AS (
  SELECT doc_id,
         len({_tokens('text')})::INT AS n_tokens,
         length(replace(text, ' ', '')) AS non_space,
         (length(text) - length(replace(replace(replace(replace(replace(replace(text,
             '.', ''), ',', ''), ';', ''), ':', ''), '!', ''), '?', '')))::DOUBLE
           / greatest(length(text)::DOUBLE, 1.0) AS pr
  FROM surv),
quality AS (
  SELECT doc_id,
         round(least(n_tokens::DOUBLE / 20.0, 1.0) * 0.5
               + (CASE WHEN (CASE WHEN n_tokens > 0 THEN non_space::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END) >= 3
                        AND (CASE WHEN n_tokens > 0 THEN non_space::DOUBLE / n_tokens::DOUBLE ELSE 0.0 END) <= 10
                       THEN 0.3 ELSE 0.0 END)
               + (CASE WHEN pr <= 0.1 THEN 0.2 ELSE 0.0 END), 6) AS quality_score
  FROM qbase),
kept AS (
  SELECT s.doc_id, s.text, q.quality_score
  FROM surv s JOIN quality q ON s.doc_id = q.doc_id
  WHERE q.quality_score >= {QUALITY_MIN}),
aug AS (
  SELECT doc_id, quality_score,
         CASE WHEN doc_id % 5 = 0 THEN
           text || ' contact user' || doc_id::VARCHAR || '@example.com or 555-0142'
         ELSE text END AS text
  FROM kept),
scrub AS (
  SELECT doc_id, quality_score,
         regexp_replace(regexp_replace(text, '{email_sql}', '<EMAIL>', 'g'),
                        '{PHONE_RE}', '<PHONE>', 'g') AS clean_text,
         (len(regexp_extract_all(text, '{email_sql}'))
          + len(regexp_extract_all(text, '{PHONE_RE}')))::INT AS n_redactions
  FROM aug),
pbase AS (
  SELECT doc_id, quality_score, n_redactions,
         doc_id % {PACK_GROUPS} AS pack_group,
         len({_tokens('clean_text')})::INT AS n_tokens
  FROM scrub),
w AS (
  SELECT *, coalesce(SUM(n_tokens) OVER (
      PARTITION BY pack_group ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM pbase)
SELECT doc_id, quality_score, n_redactions, pack_group, n_tokens,
       (before // {PACK_BUDGET})::INT AS pack_id,
       ((before % {PACK_BUDGET}) + n_tokens > {PACK_BUDGET}) AS overflowed
FROM w
"""

    sh_width = SIMHASH_BITS // SIMHASH_CHUNKS
    sh_mask = (1 << sh_width) - 1
    sh_nhex = max(6, (SIMHASH_BITS + 3) // 4)
    sql["neardup_simhash"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         substr(text, 1, length(text) - {NEARDUP_TRUNC}) AS text
  FROM documents),
hashed AS (
  SELECT doc_id, {_element_hashes(_tokens('text'), nhex=sh_nhex)} AS hs FROM corpus),
fps AS (SELECT doc_id, {_simhash_bits('hs', SIMHASH_BITS)} AS fp FROM hashed),
chunked AS (
  SELECT doc_id, fp, c::INT AS chunk_index, (fp >> (c * {sh_width})) & {sh_mask} AS chunk_val
  FROM (SELECT doc_id, fp, unnest(range(0, {SIMHASH_CHUNKS})) AS c FROM fps)),
pairs AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b, l.fp AS fp_a, r.fp AS fp_b
  FROM chunked l JOIN chunked r
    ON l.chunk_index = r.chunk_index AND l.chunk_val = r.chunk_val AND l.doc_id < r.doc_id)
SELECT id_a, id_b, bit_count(xor(fp_a, fp_b))::INT AS hamming
FROM pairs WHERE bit_count(xor(fp_a, fp_b)) <= {SIMHASH_MAXH}
"""


    ga, gb = _word_ngrams("l.text", WORD_NGRAM), _word_ngrams("r.text", WORD_NGRAM)
    sql["neardup_jaccard"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         substr(text, 1, length(text) - {NEARDUP_TRUNC}) AS text
  FROM documents),
hashed AS (SELECT doc_id, {_element_hashes(_word_ngrams('text', WORD_NGRAM))} AS hs FROM corpus),
sigs AS (SELECT doc_id, {_minhash_from_hashes('hs', MINHASH_HASHES)} AS sig FROM hashed),
banded AS (
  SELECT doc_id, b::INT AS band_index,
         list_slice(sig, b * {rows_per_band} + 1, (b + 1) * {rows_per_band}) AS band_sig
  FROM (SELECT doc_id, sig, unnest(range(0, {MINHASH_BANDS})) AS b FROM sigs)),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band_index = r.band_index AND l.band_sig = r.band_sig AND l.doc_id < r.doc_id),
verified AS (
  SELECT c.id_a, c.id_b,
         round(
           len(list_filter(list_distinct({ga}), x -> list_contains({gb}, x)))::DOUBLE
           / (len(list_distinct({ga})) + len(list_distinct({gb}))
              - len(list_filter(list_distinct({ga}), x -> list_contains({gb}, x))))::DOUBLE,
           6) AS jaccard
  FROM cand c JOIN corpus l ON c.id_a = l.doc_id JOIN corpus r ON c.id_b = r.doc_id)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.5
"""

    # hash split: same md5 bucket + CASE cuts, recomputed from scratch
    from .queries import SPLIT_BUCKETS, SPLIT_FRACTIONS

    _bucket = (
        "(('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 6))::BIGINT) "
        f"% {SPLIT_BUCKETS}"
    )
    _names = list(SPLIT_FRACTIONS)
    _cuts, _cum = [], 0.0
    for _n in _names[:-1]:
        _cum += SPLIT_FRACTIONS[_n]
        _cuts.append((_n, int(_cum * SPLIT_BUCKETS + 1e-9)))
    _split_case = (
        "CASE "
        + " ".join(f"WHEN bucket < {c} THEN '{n}'" for n, c in _cuts)
        + f" ELSE '{_names[-1]}' END"
    )
    sql["dataset_split"] = f"""
WITH b AS (SELECT doc_id, source, {_bucket} AS bucket FROM documents)
SELECT doc_id, source, bucket, {_split_case} AS split FROM b
"""

    sql["split_leakage"] = f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         substr(text, 1, length(text) - {NEARDUP_TRUNC}) AS text
  FROM documents),
hashed AS (SELECT doc_id, {_element_hashes(_word_ngrams('text', WORD_NGRAM))} AS hs FROM corpus),
sigs AS (SELECT doc_id, {_minhash_from_hashes('hs', MINHASH_HASHES)} AS sig FROM hashed),
banded AS (
  SELECT doc_id, b::INT AS band_index,
         list_slice(sig, b * {rows_per_band} + 1, (b + 1) * {rows_per_band}) AS band_sig
  FROM (SELECT doc_id, sig, unnest(range(0, {MINHASH_BANDS})) AS b FROM sigs)),
star AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY band_index, band_sig) AS bmin
  FROM banded),
edges AS (
  SELECT DISTINCT doc_id AS src, bmin AS dst FROM star WHERE doc_id <> bmin
  UNION
  SELECT DISTINCT bmin AS src, doc_id AS dst FROM star WHERE doc_id <> bmin),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id AS r FROM sigs
  UNION
  SELECT reach.doc_id, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src),
groups AS (SELECT doc_id, MIN(r)::BIGINT AS group_rep FROM reach GROUP BY doc_id),
assigned AS (
  SELECT doc_id, {_split_case} AS split
  FROM (SELECT doc_id, {_bucket} AS bucket FROM corpus)),
agg AS (
  SELECT g.group_rep,
         count(*)::BIGINT AS n_docs,
         sum(CASE WHEN a.split = 'train' THEN 1 ELSE 0 END)::BIGINT AS n_train,
         sum(CASE WHEN a.split = 'val' THEN 1 ELSE 0 END)::BIGINT AS n_val,
         sum(CASE WHEN a.split = 'test' THEN 1 ELSE 0 END)::BIGINT AS n_test
  FROM groups g JOIN assigned a USING (doc_id)
  GROUP BY g.group_rep)
SELECT group_rep, n_docs, n_train, n_val, n_test,
       (n_train > 0 AND n_test > 0) AS leaked
FROM agg WHERE n_docs > 1
"""

    # PPJoin oracle: ALL-PAIRS exact truth through an inverted-index
    # group-by (a pair appears iff it shares >= 1 gram, which J >= t > 0
    # implies), so the prefix-filtered Spark join is checked for
    # completeness, not just precision. Threshold cut on the UNROUNDED
    # IEEE quotient, mirroring the Spark side.
    from .queries import PPJOIN_THRESHOLD

    sql["neardup_ppjoin"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         substr(text, 1, length(text) - {NEARDUP_TRUNC}) AS text
  FROM documents),
g AS (SELECT doc_id, list_distinct({_word_ngrams('text', WORD_NGRAM)}) AS g FROM corpus),
gsz AS (SELECT doc_id, len(g) AS s FROM g WHERE len(g) > 0),
e AS (SELECT doc_id, unnest(g) AS el FROM g),
m AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM e a JOIN e b ON a.el = b.el AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
j AS (
  SELECT m.id_a, m.id_b, m.inter::DOUBLE AS i,
         (sa.s + sb.s - m.inter)::DOUBLE AS u
  FROM m JOIN gsz sa ON sa.doc_id = m.id_a JOIN gsz sb ON sb.doc_id = m.id_b)
SELECT id_a, id_b, round(i / u, 6) AS jaccard
FROM j WHERE i / u >= {PPJOIN_THRESHOLD}
"""

    from .functions.text import BPE_TOKEN_RE

    sql["token_counts"] = f"""
SELECT doc_id,
       len({toks})::INT AS ws_tokens,
       len(regexp_extract_all(text, {_sql_lit(BPE_TOKEN_RE)}))::INT AS bpe_tokens,
       length(text)::INT AS n_chars,
       round(length(text)::DOUBLE
             / greatest(len(regexp_extract_all(text, {_sql_lit(BPE_TOKEN_RE)})), 1)::DOUBLE,
             6) AS chars_per_token
FROM documents
"""

    from .queries import SAMPLE_PCT, TFIDF_TOP, VOCAB_TOP

    sql["vocab_top_tokens"] = f"""
SELECT token, count(*) AS n_occurrences
FROM (SELECT unnest({toks}) AS token FROM documents)
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT {VOCAB_TOP}
"""

    sql["tfidf_top_terms"] = f"""
WITH dt AS (SELECT doc_id, unnest({toks}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM dt GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dft.df,
         round(tf.tf * (ln((n.n_docs + 1.0) / (dft.df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf JOIN dft USING (term) CROSS JOIN n),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
  FROM scored)
SELECT doc_id, term, tf, df, tfidf, rnk::INT AS rank FROM ranked WHERE rnk <= {TFIDF_TOP}
"""

    sample_bucket = "('0x' || substr(md5('sample:' || doc_id), 1, 6))::BIGINT % 100"
    sql["sample_docs_hash"] = f"""
SELECT doc_id,
       ({sample_bucket})::INT AS sample_bucket,
       length(text)::INT AS n_chars
FROM documents
WHERE {sample_bucket} < {SAMPLE_PCT}
"""

    sql["approx_distinct_parts"] = """
SELECT count(DISTINCT l_partkey) AS n_exact, TRUE AS err_ok FROM lineitem
"""

    sql["neardup_embedding"] = f"""
SELECT l.vec_id AS id_a, r.vec_id AS id_b,
       round({_cos('l.embedding', 'r.embedding', EMBED_DIM)}, 6) AS cosine_sim
FROM embeddings l JOIN embeddings r
  ON l.label = r.label AND l.vec_id < r.vec_id
WHERE round({_cos('l.embedding', 'r.embedding', EMBED_DIM)}, 6) >= 0.35
"""

    sql["tpch_q1_pricing"] = f"""
SELECT l_returnflag, l_linestatus,
       {_dsum('l_quantity')} AS sum_qty,
       {_dsum('l_extendedprice')} AS sum_base_price,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

    sql["revenue_by_nation"] = f"""
SELECT n_name AS nation,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

    sql["top_unshipped_orders"] = f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-06-01'
  AND l_shipdate > TIMESTAMP '1996-06-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

    sql["local_supplier_volume"] = f"""
SELECT n_name AS nation,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""

    sql["top_parts_per_brand"] = """
SELECT p_brand, p_partkey, p_retailprice, rn::INT AS rn
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part)
WHERE rn <= 3
"""

    sql["customer_segments"] = f"""
SELECT c_mktsegment,
       count(*) AS n_customers,
       {_dsum('c_acctbal')} AS total_acctbal,
       round({_dsum('c_acctbal')} / count(*), 6) AS avg_acctbal
FROM customer GROUP BY c_mktsegment
"""

    sql["rollup_pricing"] = f"""
SELECT l_returnflag, l_linestatus,
       {_dsum('l_quantity')} AS sum_qty,
       count(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

    sql["grouping_sets_pricing"] = f"""
SELECT l_returnflag, l_linestatus,
       grouping(l_returnflag, l_linestatus)::INT AS gid,
       {_dsum('l_quantity')} AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus))
"""

    sql["above_avg_customers"] = f"""
WITH scored AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         round(CAST(SUM(CAST(c_acctbal AS {DEC})) OVER w AS DOUBLE)
               / COUNT(*) OVER w, 6) AS seg_avg
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment))
SELECT c_custkey, c_mktsegment, c_acctbal, seg_avg
FROM scored WHERE c_acctbal > seg_avg
"""

    sql["semi_anti_customers"] = """
SELECT c_mktsegment,
       count(*) FILTER (WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_with_orders,
       count(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without_orders
FROM customer GROUP BY c_mktsegment
"""

    # plain-join twin: the salting rewrite must be result-invariant
    sql["salted_join_segments"] = f"""
SELECT c_mktsegment,
       count(*) AS n_orders,
       {_dsum('o_totalprice')} AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

    sql["asof_join_events"] = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
clicks AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""

    sql["pivot_order_status"] = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
FROM orders GROUP BY o_orderpriority
"""

    sql["sessionize_events"] = """
WITH gaps AS (
  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us,
         epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP))
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS gap_us
  FROM events),
flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_session
  FROM gaps),
sessions AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged),
per_session AS (
  SELECT user_id, session_no, count(*) AS n_events
  FROM sessions GROUP BY user_id, session_no)
SELECT user_id, count(*) AS n_sessions,
       max(n_events)::BIGINT AS max_session_events,
       sum(n_events)::BIGINT AS total_events
FROM per_session GROUP BY user_id
"""

    sql["distinct_parts_per_supplier"] = """
SELECT l_suppkey,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem GROUP BY l_suppkey
"""

    sql["pages_roundtrip"] = """
SELECT doc_id, text FROM documents
"""

    # stream_pdf_ingest: the streamed-and-reassembled PDFs must equal
    # the source documents exactly; n_pages follows from the 400-char
    # page split (constants mirrored from streaming/ingest.py)
    sql["stream_pdf_ingest"] = """
SELECT doc_id,
       (CASE WHEN length(text) <= 400 THEN 1
             ELSE (length(text) + 399) // 400 END)::INT AS n_pages,
       text
FROM documents WHERE doc_id < 40
"""

    sql["upsert_compact"] = """
WITH existing AS (
  SELECT 'doc-' || doc_id AS id, text, 1::BIGINT AS ingest_version, 0 AS is_batch
  FROM documents),
batch AS (
  SELECT 'doc-' || doc_id AS id, upper(text) AS text, 2::BIGINT AS ingest_version, 1 AS is_batch
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT 'new-' || doc_id AS id, text, 2::BIGINT AS ingest_version, 1 AS is_batch
  FROM documents WHERE doc_id % 7 = 0),
unioned AS (SELECT * FROM existing UNION ALL SELECT * FROM batch),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY ingest_version DESC, is_batch DESC) AS rn
  FROM unioned)
SELECT id, ingest_version,
       ('0x' || substr(md5(text), 1, 12))::BIGINT AS content_fp48
FROM ranked WHERE rn = 1
"""

    # same LWW semantics through the bucketed-storage merge path and
    # the streaming foreachBatch merge-per-micro-batch path (versions
    # differ on every colliding id, so batch boundaries can't change
    # the LWW outcome)
    sql["upsert_bucketed"] = sql["upsert_compact"]
    sql["stream_upsert_store"] = sql["upsert_compact"]

    sql["setops_parts"] = """
WITH cat AS (SELECT p_partkey AS partkey FROM part),
     sold AS (SELECT l_partkey AS partkey FROM lineitem)
SELECT partkey, 'union' AS set_op
  FROM (SELECT partkey FROM cat UNION SELECT partkey FROM sold)
UNION ALL
SELECT partkey, 'intersect' AS set_op
  FROM (SELECT partkey FROM cat INTERSECT SELECT partkey FROM sold)
UNION ALL
SELECT partkey, 'except' AS set_op
  FROM (SELECT partkey FROM cat EXCEPT SELECT partkey FROM sold)
"""

    sql["q6_revenue_band"] = f"""
SELECT {_dsum('l_extendedprice * l_discount')} AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07
  AND l_quantity < 24
"""

    sql["orders_calendar"] = f"""
SELECT EXTRACT(year FROM o_orderdate)::INT AS o_year,
       EXTRACT(quarter FROM o_orderdate)::INT AS o_quarter,
       count(*) AS n_orders,
       {_dsum('o_totalprice')} AS total_price,
       SUM(CASE WHEN substr(o_orderpriority, 1, 1) = '1' THEN 1 ELSE 0 END)::BIGINT AS n_urgent,
       MIN(strftime(o_orderdate, '%Y-%m-%d')) AS first_day,
       MAX(strftime(o_orderdate, '%Y-%m-%d')) AS last_day
FROM orders
GROUP BY 1, 2
"""

    sql["percentiles_acctbal"] = f"""
SELECT c_mktsegment,
       round(quantile_cont(c_acctbal, 0.25), 6) AS p25,
       round(quantile_cont(c_acctbal, 0.5), 6) AS p50,
       round(quantile_cont(c_acctbal, 0.75), 6) AS p75,
       round({_dsum('c_acctbal')} / count(*), 6) AS mean_acctbal,
       count(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
"""

    # sketch-gate twin: DuckDB recomputes the exact percentiles; the
    # Spark side folds its measured approx-vs-exact error into a
    # boolean asserted TRUE (same pattern as q3_ann_recall)
    sql["approx_percentiles_gate"] = """
SELECT c_mktsegment,
       round(quantile_cont(c_acctbal, 0.25), 6) AS p25,
       round(quantile_cont(c_acctbal, 0.5), 6) AS p50,
       round(quantile_cont(c_acctbal, 0.75), 6) AS p75,
       TRUE AS sketch_ok
FROM customer
GROUP BY c_mktsegment
"""

    sql["events_json_props"] = """
SELECT event_type,
       count(*) AS n_events,
       SUM((props->>'k')::BIGINT)::BIGINT AS sum_k,
       MIN((props->>'k')::BIGINT) AS min_k,
       MAX((props->>'k')::BIGINT) AS max_k,
       COUNT(CASE WHEN (props->>'k')::BIGINT % 2 = 0 THEN 1 END) AS n_even_k
FROM events
GROUP BY event_type
"""

    from .functions.hashing import (
        ROLLING_M,
        ROLLING_MAXPOS,
        ROLLING_TOKMOD,
        rolling_coefs,
    )

    coefs = "[" + ", ".join(str(c) for c in rolling_coefs()) + "]"
    toks = _tokens("text")
    # the outer ::BIGINT matters: list_sum returns HUGEINT, which the
    # driver's typed hash compare sees as a non-int64 column even though
    # the values are identical (CORRECTNESS_r01 hash_match=false)
    sql["rolling_fingerprint"] = f"""
WITH coef AS (SELECT {coefs}::BIGINT[] AS cs)
SELECT doc_id,
       (COALESCE(list_sum(list_transform(range(1, len({toks}) + 1),
         i -> ((('0x' || substr(md5({toks}[i]), 1, 6))::BIGINT % {ROLLING_TOKMOD})
               * cs[((i - 1) % {ROLLING_MAXPOS}) + 1]) % {ROLLING_M})),
         0) % {ROLLING_M})::BIGINT AS rolling_fp,
       len({toks})::BIGINT AS n_tokens
FROM documents, coef
"""

    # chunker_separator: the greedy separator-merge is a deterministic
    # automaton over the split sequence — state (next split i, window
    # front f); a chunk [f, i-1] is emitted when split i would overflow
    # chunk_size, then f advances to the first j whose retained tail
    # fits chunk_overlap (prefix sums make both tests O(1)). The
    # recursive CTE walks that automaton exactly; validated cell-for-
    # cell against operators/chunker._split_separator on the fixture.
    sql["chunker_separator"] = f"""
WITH RECURSIVE
base AS (
  SELECT doc_id, string_split(text, ' ') AS sp FROM documents WHERE length(text) > 0),
pre AS (
  SELECT doc_id, sp, len(sp) AS n,
         list_transform(sp, s -> length(s)) AS L,
         list_transform(range(1, len(sp) + 2),
            j -> COALESCE(list_sum(list_slice(list_transform(sp, s -> length(s)), 1, j - 1)), 0)) AS P
  FROM base),
walk(doc_id, i, f, e_start, e_end) AS (
  SELECT doc_id, 1::BIGINT, 1::BIGINT, NULL::BIGINT, NULL::BIGINT FROM pre
  UNION ALL
  SELECT doc_id, i + 1,
         CASE WHEN cond THEN newf ELSE f END,
         CASE WHEN cond THEN f ELSE NULL END,
         CASE WHEN cond THEN i - 1 ELSE NULL END
  FROM (
    SELECT w.doc_id, w.i, w.f,
           (w.f < w.i AND p.P[w.i] - p.P[w.f] + (w.i - 1 - w.f) + p.L[w.i] + 1 > {CHUNK_SIZE}) AS cond,
           list_min(list_filter(range(w.f, w.i + 1),
               j -> j = w.i OR p.P[w.i] - p.P[j] + (w.i - 1 - j) <= {CHUNK_OVERLAP})) AS newf
    FROM walk w JOIN pre p ON w.doc_id = p.doc_id
    WHERE w.i <= p.n) t),
mid AS (
  SELECT doc_id, i AS ord, 0 AS sub, e_start AS cf, e_end AS cl
  FROM walk WHERE e_start IS NOT NULL),
fin AS (
  SELECT w.doc_id, w.i AS ord, 1 AS sub, w.f AS cf, p.n AS cl
  FROM walk w JOIN pre p USING (doc_id) WHERE w.i = p.n + 1),
allc AS (SELECT * FROM mid UNION ALL SELECT * FROM fin)
SELECT a.doc_id,
       (row_number() OVER (PARTITION BY a.doc_id ORDER BY a.ord, a.sub) - 1)::INT AS chunk_index,
       array_to_string(list_slice(p.sp, a.cf::INT, a.cl::INT), ' ') AS chunk_text
FROM allc a JOIN pre p USING (doc_id)
"""

    sql["clicks_before_purchase"] = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       n_clicks_1h
FROM (
  SELECT event_id, user_id, ts, event_type,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
         )::BIGINT AS n_clicks_1h
  FROM events)
WHERE event_type = 'purchase'
"""

    # DuckDB plans the BETWEEN predicate natively (IEJoin); the Spark
    # side must reproduce it through the banded equi-join rewrite
    sql["clicks_in_purchase_window"] = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""

    # stream-stream interval join parity: same pairs as the batch
    # banded range join, same oracle
    sql["stream_clicks_purchases"] = sql["clicks_in_purchase_window"]

    # LEFT variant: DuckDB's native LEFT IEJoin null-extends clicks
    # outside every window, exactly once per click
    sql["outer_range_join"] = """
SELECT c.event_id AS click_id, c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       p.event_id AS purchase_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
"""

    # FULL banded interval join (r10): DuckDB's native FULL IEJoin;
    # user_id fills from whichever side is present, matching the
    # operator's on-key contract
    sql["full_outer_range_join"] = """
SELECT c.event_id AS click_id,
       coalesce(c.user_id, p.user_id) AS user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       p.event_id AS purchase_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
"""

    # RIGHT banded interval join (r11): DuckDB's native RIGHT IEJoin;
    # matched pairs plus cold purchase windows, unmatched clicks gone
    sql["right_outer_range_join"] = """
SELECT c.event_id AS click_id,
       coalesce(c.user_id, p.user_id) AS user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       p.event_id AS purchase_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
RIGHT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
"""

    # stream==batch OUTER interval-join parity (r10): the bounded
    # streaming replay of the left outer stream-stream join must equal
    # the batch left banded range join — same oracle, the LEFT IEJoin
    sql["stream_outer_interval_join"] = sql["outer_range_join"]

    # stream-static join parity: identical output contract to the
    # batch incremental dedup, same oracle
    sql["stream_dedup_incremental"] = sql["dedup_incremental"]

    sql["cube_pricing"] = f"""
SELECT l_returnflag, l_linestatus,
       {_dsum('l_quantity')} AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

    # Spark session_window merges events whose windows OVERLAP
    # ([t, t+gap) half-open), so a new session starts at diff >= gap.
    sql["session_windows_native"] = f"""
WITH gapped AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sess AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sno
  FROM gapped)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events,
       {_dsum('value')} AS total_value
FROM sess GROUP BY user_id, sno
"""

    sql["events_hourly"] = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       {_dsum('value')} AS total_value
FROM events GROUP BY 1, 2
"""

    # stream == batch, as a driver row: the bounded streaming replay
    # must reproduce the batch aggregation exactly
    sql["stream_events_hourly"] = sql["events_hourly"]
    # stream==batch sessionization parity: same operator, same oracle
    sql["stream_session_windows"] = sql["session_windows_native"]

    sql["stream_dedup_keys"] = """
SELECT DISTINCT user_id, event_type FROM events
"""

    from .queries import (
        FUNNEL_STAGES,
        LM_BAND_LOW,
        LM_BAND_MID,
        MAD_K,
        MAD_SCALE,
        RETENTION_ANCHOR,
        SEG_N,
    )

    # corpus segment dedup + rewrite: global keep-first occurrence of
    # every SEG_N-token segment, per-doc reassembly, compared by md5
    # of the rewritten text
    sql["segment_dedup"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS tk
  FROM documents),
segs AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(tk[(i-1)*{SEG_N}+1 : i*{SEG_N}], ' ') AS seg
  FROM toks,
       unnest(range(1, greatest((len(tk)+{SEG_N}-1)//{SEG_N}, 1)+1)) AS u(i)),
flagged AS (
  SELECT doc_id, seg_idx, seg,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) = 1
           AS keep
  FROM segs),
rebuilt AS (
  SELECT doc_id,
         count(*) AS n_segments,
         sum(keep::INT)::BIGINT AS kept_segments,
         coalesce(array_to_string(
           list(seg ORDER BY seg_idx) FILTER (WHERE keep), ' '), '')
           AS clean_text
  FROM flagged GROUP BY doc_id)
SELECT doc_id, n_segments, kept_segments,
       md5(clean_text) AS clean_md5,
       length(clean_text)::INT AS clean_chars
FROM rebuilt
"""

    # bigram-LM cross-entropy: MLE p(w2|w1) over the corpus, per-doc
    # mean of per-occurrence -ln p (rounded at 6 before the
    # order-independent decimal sum, like the Spark side)
    toks_expr = "list_filter(string_split(text, ' '), t -> t != '')"
    sql["lm_bigram_quality"] = f"""
WITH toks AS (SELECT doc_id, {toks_expr} AS tk FROM documents),
big AS (
  SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
  FROM toks, unnest(range(1, len(tk))) AS u(i)),
c2 AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c) AS ctx FROM c2 GROUP BY 1),
model AS (
  SELECT w1, w2, round(-ln(c::DOUBLE / ctx::DOUBLE), 6) AS lp
  FROM c2 JOIN c1 USING (w1)),
scored AS (
  SELECT big.doc_id, model.lp FROM big JOIN model USING (w1, w2)),
perdoc AS (
  SELECT t.doc_id,
         count(s.lp) AS n_bigrams,
         CASE WHEN count(s.lp) > 0 THEN
           round({_dsum('s.lp')} / count(s.lp)::DOUBLE, 6)
         END AS xent
  FROM toks t LEFT JOIN scored s USING (doc_id)
  GROUP BY t.doc_id)
SELECT doc_id, n_bigrams, xent,
       CASE WHEN xent <= {LM_BAND_LOW} THEN 'low'
            WHEN xent <= {LM_BAND_MID} THEN 'mid'
            ELSE 'high' END AS ppl_band
FROM perdoc
"""

    # ordered funnel: min-ts chaining per user, one output row per
    # stage with reached counts + conversion rates
    s1, s2, s3, s4 = FUNNEL_STAGES
    sql["funnel_conversion"] = f"""
WITH r1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = '{s1}' GROUP BY 1),
r2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN r1 USING (user_id)
  WHERE e.event_type = '{s2}' AND e.ts >= r1.t GROUP BY 1),
r3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN r2 USING (user_id)
  WHERE e.event_type = '{s3}' AND e.ts >= r2.t GROUP BY 1),
r4 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN r3 USING (user_id)
  WHERE e.event_type = '{s4}' AND e.ts >= r3.t GROUP BY 1),
n AS (SELECT (SELECT count(*) FROM r1) AS n1,
             (SELECT count(*) FROM r2) AS n2,
             (SELECT count(*) FROM r3) AS n3,
             (SELECT count(*) FROM r4) AS n4)
SELECT s.stage_idx, s.stage, s.n_users,
       round(s.n_users::DOUBLE / s.prev::DOUBLE, 6) AS conv_from_prev,
       round(s.n_users::DOUBLE / n.n1::DOUBLE, 6) AS conv_from_first
FROM n, LATERAL (VALUES
  (1, '{s1}', n.n1, n.n1),
  (2, '{s2}', n.n2, n.n1),
  (3, '{s3}', n.n3, n.n2),
  (4, '{s4}', n.n4, n.n3)) AS s(stage_idx, stage, n_users, prev)
"""

    # weekly cohort retention vs the fixed anchor
    sql["retention_cohorts"] = f"""
WITH evd AS (
  SELECT user_id,
         date_diff('day', DATE '{RETENTION_ANCHOR}', ts::DATE) AS day
  FROM events),
first AS (SELECT user_id, min(day) AS first_day FROM evd GROUP BY 1),
cohort AS (SELECT user_id, first_day // 7 AS cohort_week FROM first),
sz AS (SELECT cohort_week, count(*) AS cohort_size FROM cohort GROUP BY 1),
act AS (
  SELECT DISTINCT evd.user_id, c.cohort_week,
         evd.day // 7 - c.cohort_week AS week_offset
  FROM evd JOIN cohort c USING (user_id)),
agg AS (
  SELECT cohort_week, week_offset, count(*) AS n_active
  FROM act GROUP BY 1, 2)
SELECT a.cohort_week::INT AS cohort_week, a.week_offset::INT AS week_offset,
       a.n_active, s.cohort_size,
       round(a.n_active::DOUBLE / s.cohort_size::DOUBLE, 6) AS retention
FROM agg a JOIN sz s USING (cohort_week)
"""

    # SCD2 from the orders change log: change-detected priority
    # intervals per customer
    sql["scd2_customer_priority"] = """
WITH ordered AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         lag(o_orderpriority) OVER w AS prev,
         row_number() OVER w AS rn
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
changed AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
  FROM ordered WHERE rn = 1 OR o_orderpriority IS DISTINCT FROM prev)
SELECT o_custkey, o_orderpriority,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w AS valid_to,
       (row_number() OVER w)::INT AS version,
       lead(o_orderdate) OVER w IS NULL AS is_current
FROM changed
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

    # adversarial SCD2 (r11, VERDICT r10 item 3): same replay over a
    # changelog whose attribute is NULLed for o_orderkey % 5 IN (0, 3)
    # — the input provably contains non-NULL→NULL, NULL→non-NULL and
    # repeated-NULL shapes, so the null-safe change detection
    # (IS DISTINCT FROM) is driver-certified, not just pytest-pinned
    sql["scd2_null_transitions"] = """
WITH src AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CASE WHEN o_orderkey % 5 IN (0, 3) THEN NULL
              ELSE o_orderpriority END AS priority
  FROM orders),
ordered AS (
  SELECT o_custkey, priority, o_orderdate, o_orderkey,
         lag(priority) OVER w AS prev,
         row_number() OVER w AS rn
  FROM src
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
changed AS (
  SELECT o_custkey, priority, o_orderdate, o_orderkey
  FROM ordered WHERE rn = 1 OR priority IS DISTINCT FROM prev)
SELECT o_custkey, priority,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w AS valid_to,
       (row_number() OVER w)::INT AS version,
       lead(o_orderdate) OVER w IS NULL AS is_current
FROM changed
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

    # adversarial duplicate-version upsert (r11, VERDICT r10 item 3):
    # the oracle derives the expected LWW survivor per id DIRECTLY
    # (independent derivation, not a mechanics replay) — precedence:
    # the %11 within-batch duplicate pair at version 3, then the %3
    # version-2 upgrade, then the %7 batch-wins same-version tie,
    # else the untouched existing row
    sql["upsert_dup_versions"] = """
SELECT c_custkey AS id,
       CASE WHEN c_custkey % 11 = 0 THEN 'DUP'
            WHEN c_custkey % 3 = 0 THEN upper(c_mktsegment)
            WHEN c_custkey % 7 = 0 THEN c_mktsegment || '!'
            ELSE c_mktsegment END AS seg,
       CAST(CASE WHEN c_custkey % 11 = 0 THEN 3
                 WHEN c_custkey % 3 = 0 THEN 2
                 ELSE 1 END AS BIGINT) AS v
FROM customer
"""

    # PIT join: replay SCD2 build + interval match + digest
    sql["pit_priority_revenue"] = f"""
WITH ordered AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         lag(o_orderpriority) OVER w AS prev,
         row_number() OVER w AS rn
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
changed AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
  FROM ordered WHERE rn = 1 OR o_orderpriority IS DISTINCT FROM prev),
dim AS (
  SELECT o_custkey, o_orderpriority,
         o_orderdate AS valid_from,
         lead(o_orderdate) OVER w AS valid_to,
         (row_number() OVER w)::INT AS version
  FROM changed
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
facts AS (
  SELECT o.o_custkey, l.l_shipdate, l.l_orderkey, l.l_extendedprice
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
j AS (
  SELECT d.o_orderpriority AS priority_at_ship, f.l_orderkey,
         f.l_extendedprice, d.version
  FROM facts f JOIN dim d
    ON f.o_custkey = d.o_custkey
   AND f.l_shipdate >= d.valid_from
   AND (d.valid_to IS NULL OR f.l_shipdate < d.valid_to))
SELECT priority_at_ship, count(*)::BIGINT AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS revenue,
       SUM(l_orderkey)::BIGINT AS sum_keys,
       SUM(version)::BIGINT AS sum_versions
FROM j GROUP BY priority_at_ship
"""

    # LEFT PIT join (r10): same SCD2 replay, then every customer LEFT
    # joined to the version whose interval contains the audit instant —
    # no-order customers and first-version-after-date customers stay,
    # null-extended
    from .queries import PIT_AS_OF

    sql["outer_pit_join"] = f"""
WITH ordered AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         lag(o_orderpriority) OVER w AS prev,
         row_number() OVER w AS rn
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
changed AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
  FROM ordered WHERE rn = 1 OR o_orderpriority IS DISTINCT FROM prev),
dim AS (
  SELECT o_custkey, o_orderpriority,
         o_orderdate AS valid_from,
         lead(o_orderdate) OVER w AS valid_to,
         (row_number() OVER w)::INT AS version
  FROM changed
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
SELECT c.c_custkey AS custkey,
       d.o_orderpriority AS priority_asof,
       d.version,
       strftime(d.valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from
FROM customer c LEFT JOIN dim d
  ON c.c_custkey = d.o_custkey
 AND TIMESTAMP '{PIT_AS_OF}' >= d.valid_from
 AND (d.valid_to IS NULL OR TIMESTAMP '{PIT_AS_OF}' < d.valid_to)
"""

    # boundary-tied PIT join (r12, VERDICT r11 item 4): same SCD2
    # replay; the facts are the dim's own valid_from instants x2
    # copies, matched with the HALF-OPEN [valid_from, valid_to)
    # predicate — a strict > or a closed <= kernel shifts the digest
    sql["pit_boundary_ties"] = """
WITH ordered AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         lag(o_orderpriority) OVER w AS prev,
         row_number() OVER w AS rn
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
changed AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
  FROM ordered WHERE rn = 1 OR o_orderpriority IS DISTINCT FROM prev),
dim AS (
  SELECT o_custkey, o_orderpriority,
         o_orderdate AS valid_from,
         lead(o_orderdate) OVER w AS valid_to,
         (row_number() OVER w)::INT AS version
  FROM changed
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
bounds AS (
  SELECT o_custkey, valid_from AS ts, version AS src_version FROM dim),
facts AS (
  SELECT *, 1 AS copy FROM bounds
  UNION ALL SELECT *, 2 AS copy FROM bounds),
j AS (
  SELECT d.o_orderpriority, d.valid_from, d.version,
         f.ts, f.src_version
  FROM facts f JOIN dim d
    ON f.o_custkey = d.o_custkey
   AND f.ts >= d.valid_from
   AND (d.valid_to IS NULL OR f.ts < d.valid_to))
SELECT o_orderpriority AS priority_at_ts,
       count(*)::BIGINT AS n_facts,
       SUM(version)::BIGINT AS sum_matched_versions,
       SUM(src_version)::BIGINT AS sum_src_versions,
       SUM(CASE WHEN ts = valid_from THEN 1 ELSE 0 END)::BIGINT AS n_at_start,
       SUM(CASE WHEN src_version >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_end_tied
FROM j GROUP BY priority_at_ts
"""

    # same-instant as-of ties (r12, VERDICT r11 item 4): the same
    # augmented click set (injected AT purchase instants), matched by
    # DuckDB's native ASOF LEFT JOIN (>= semantics — a tied click
    # matches) — independent of the Spark union+last_value kernel
    sql["asof_boundary_ties"] = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
clicks AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
  UNION ALL SELECT user_id, ts FROM purchases WHERE event_id % 3 = 0
  UNION ALL SELECT user_id, ts FROM purchases WHERE event_id % 6 = 0
  UNION ALL SELECT user_id + 1 AS user_id, ts FROM purchases
            WHERE event_id % 7 = 0)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts,
       coalesce(p.ts = c.ts, false) AS matched_at_instant
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""

    # robust MAD outliers: medians rounded at 6 BEFORE scoring in both
    # engines, so the score arithmetic starts from identical numbers
    sql["anomaly_mad"] = f"""
WITH med AS (
  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY 1),
dev AS (
  SELECT e.event_id, e.event_type, e.value, m.med,
         abs(e.value - m.med) AS ad
  FROM events e JOIN med m USING (event_type)),
mad AS (
  SELECT event_type, round(quantile_cont(ad, 0.5), 6) AS mad
  FROM dev GROUP BY 1),
scored AS (
  SELECT d.event_id, d.event_type, d.value, d.med, m.mad,
         round(d.ad / ({MAD_SCALE} * m.mad), 6) AS rscore
  FROM dev d JOIN mad m USING (event_type))
SELECT event_id, event_type, value, med, mad, rscore
FROM scored WHERE rscore > {MAD_K}
"""

    from .queries import (
        LARGE_ORDER_QTY,
        Q10_END,
        Q10_START,
        Q15_END,
        Q15_START,
        RETENTION_ANCHOR_TPCH,
    )

    sql["order_count_distribution"] = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY 1)
SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY 1
"""

    sql["large_order_customers"] = f"""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > {LARGE_ORDER_QTY})
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, big.total_qty::DOUBLE AS total_qty
FROM orders o JOIN big ON o.o_orderkey = big.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 10
"""

    rev_expr = _dsum("l_extendedprice * (1.0 - l_discount)")
    sql["top_supplier_revenue"] = f"""
WITH rev AS (
  SELECT l_suppkey, {rev_expr} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_START}'
    AND l_shipdate <  TIMESTAMP '{Q15_END}'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, round(r.total_revenue, 6) AS total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
"""

    sql["returned_items_topk"] = f"""
WITH rev AS (
  SELECT o.o_custkey, {rev_expr} AS revenue
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '{Q10_START}'
    AND o.o_orderdate <  TIMESTAMP '{Q10_END}'
  GROUP BY 1)
SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
       round(rev.revenue, 6) AS revenue
FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY rev.revenue DESC, c.c_custkey LIMIT 20
"""

    sql["rolling_revenue_7d"] = f"""
WITH daily AS (
  SELECT n.n_name,
         date_diff('day', DATE '{RETENTION_ANCHOR_TPCH}',
                   o.o_orderdate::DATE) AS day,
         {_dsum('o.o_totalprice')} AS day_rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2)
SELECT n_name, day::INT AS day, round(day_rev, 6) AS day_rev,
       round(CAST(sum(CAST(day_rev AS {DEC})) OVER (
         PARTITION BY n_name ORDER BY day
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
         AS rev_7d
FROM daily
"""

    # SemDeDup: derived clustered corpus -> signed-projection bucket
    # (sequential per-plane dot, same fold order as the Spark
    # aggregate) -> within-bucket pairs -> drop the later id of every
    # pair with round(cos, 6) >= threshold
    from .functions.hashing import md5_int_py
    from .queries import ANN_ALPHA as _SD_ALPHA
    from .queries import SEMDEDUP_COS, SEMDEDUP_PLANES

    plane_w = [
        [
            md5_int_py(f"plane:{p}:{j}") / 16777215.0 * 2.0 - 1.0
            for j in range(EMBED_DIM)
        ]
        for p in range(SEMDEDUP_PLANES)
    ]
    sd_cents = [det_embed_py(f"cluster:{l}", EMBED_DIM) for l in range(ANN_N_LABELS)]
    sd_cent_lit = (
        "["
        + ", ".join("[" + ", ".join(repr(x) for x in c) + "]" for c in sd_cents)
        + "]::DOUBLE[][]"
    )
    bucket_terms = " + ".join(
        f"(CASE WHEN ("
        + " + ".join(f"e[{j + 1}] * {plane_w[p][j]!r}" for j in range(EMBED_DIM))
        + f") > 0 THEN {2 ** p} ELSE 0 END)"
        for p in range(SEMDEDUP_PLANES)
    )
    sql["semantic_dedup"] = f"""
WITH cents AS (SELECT {sd_cent_lit} AS cs),
derived AS (
  SELECT vec_id, label,
         list_transform(range(1, {EMBED_DIM + 1}),
           i -> cs[label + 1][i] + {_SD_ALPHA!r}::DOUBLE * embedding[i]) AS e
  FROM embeddings CROSS JOIN cents),
bucketed AS (
  SELECT vec_id, label, e, ({bucket_terms})::BIGINT AS bucket FROM derived),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE round({_cos('a.e', 'b.e', EMBED_DIM)}, 6) >= {SEMDEDUP_COS}),
drops AS (SELECT DISTINCT id_b AS vec_id FROM pairs)
SELECT b.vec_id, b.label, b.bucket,
       (d.vec_id IS NOT NULL) AS is_dropped
FROM bucketed b LEFT JOIN drops d USING (vec_id)
"""

    sql["acctbal_window_stats"] = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       (ntile(4) OVER w)::INT AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""

    # ---- full-22 TPC-H shape closure (same constants as queries.py;
    # every threshold that gates a per-key TOTAL is a fraction of a
    # same-query global aggregate so selectivity is SF-invariant) ----
    from .queries import (
        Q2_MAX_SIZE,
        Q2_REGION,
        Q2_TOPN,
        Q4_END,
        Q4_LATE_DAYS,
        Q4_START,
        Q7_END,
        Q7_NATION_A,
        Q7_NATION_B,
        Q7_START,
        Q8_NATION,
        Q8_REGION,
        Q8_TYPE,
        Q9_COST_FRAC,
        Q9_NAME_FRAG,
        Q11_MEAN_MULT,
        Q11_REGION,
        Q12_END,
        Q12_HIGH,
        Q12_SLOW_DAYS,
        Q12_START,
        Q14_END,
        Q14_START,
        Q16_EXCL_BRAND,
        Q17_BRAND,
        Q17_QTY_FRAC,
        Q19_BRANCHES,
        Q20_NAME_PREFIX,
        Q20_REGION,
        Q20_VOL_FACTOR,
        Q21_LATE_DAYS,
        Q21_NATIONS,
        Q21_TOPN,
        Q22_CODE_MOD,
        Q22_IDLE_START,
    )

    sql["min_cost_supplier"] = f"""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         {_dsum('l_extendedprice')} / {_dsum('l_quantity')} AS unit_price
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
  GROUP BY 1, 2)
SELECT p_partkey, p_brand, s_name, round(unit_price, 4) AS min_unit_price
FROM cost
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size <= {Q2_MAX_SIZE}
  AND unit_price = (SELECT min(unit_price) FROM cost c2
                    WHERE c2.l_partkey = cost.l_partkey)
ORDER BY min_unit_price DESC, p_partkey, s_name
LIMIT {Q2_TOPN}
"""

    sql["priority_order_counts"] = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_START}'
  AND o_orderdate <  TIMESTAMP '{Q4_END}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY)
GROUP BY 1 ORDER BY 1
"""

    sql["nation_pair_volume"] = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate)::INT AS ship_year,
       {rev_expr} AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = '{Q7_NATION_A}' AND cn.n_name = '{Q7_NATION_B}')
    OR (sn.n_name = '{Q7_NATION_B}' AND cn.n_name = '{Q7_NATION_A}'))
  AND l_shipdate >= TIMESTAMP '{Q7_START}'
  AND l_shipdate <  TIMESTAMP '{Q7_END}'
GROUP BY 1, 2, 3
"""

    cond_rev = (
        f"CASE WHEN sn.n_name = '{Q8_NATION}' "
        "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END"
    )
    sql["market_share"] = f"""
SELECT year(o_orderdate)::INT AS order_year,
       round({_dsum(cond_rev)} / {rev_expr}, 6) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
GROUP BY 1
"""

    profit_expr = (
        "l_extendedprice * (1.0 - l_discount) "
        f"- {Q9_COST_FRAC!r}::DOUBLE * p_retailprice * l_quantity"
    )
    sql["product_profit"] = f"""
SELECT n_name AS nation, year(o_orderdate)::INT AS order_year,
       {_dsum(profit_expr)} AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{Q9_NAME_FRAG}%'
GROUP BY 1, 2
"""

    sql["important_parts"] = f"""
WITH val AS (
  SELECT l_partkey, SUM(CAST(l_quantity * p_retailprice AS {DEC})) AS pv_dec
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q11_REGION}'
  GROUP BY 1)
SELECT l_partkey AS partkey, round(CAST(pv_dec AS DOUBLE), 2) AS part_value
FROM val
WHERE CAST(pv_dec AS DOUBLE)
      > {Q11_MEAN_MULT!r}
        * (SELECT CAST(sum(pv_dec) AS DOUBLE) / count(*) FROM val)
ORDER BY part_value DESC, partkey
"""

    high_list = ", ".join(f"'{p}'" for p in Q12_HIGH)
    sql["shipmode_priority"] = f"""
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL {Q12_SLOW_DAYS} DAY
            THEN 'SLOW' ELSE 'FAST' END AS ship_bucket,
       SUM(CASE WHEN o_orderpriority IN ({high_list}) THEN 1 ELSE 0 END)::BIGINT
         AS high_line_count,
       SUM(CASE WHEN o_orderpriority NOT IN ({high_list}) THEN 1 ELSE 0 END)::BIGINT
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_START}'
  AND l_shipdate <  TIMESTAMP '{Q12_END}'
GROUP BY 1 ORDER BY 1
"""

    promo_rev = (
        f"CASE WHEN p_type = '{Q8_TYPE}' "
        "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END"
    )
    sql["promo_revenue_pct"] = f"""
SELECT round(100.0 * {_dsum(promo_rev)} / {rev_expr}, 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_START}'
  AND l_shipdate <  TIMESTAMP '{Q14_END}'
"""

    sql["supplier_part_counts"] = f"""
SELECT p_brand, p_type, (p_size // 10)::INT AS size_decade,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""

    sql["small_qty_revenue"] = f"""
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}'),
thresh AS (
  SELECT l_partkey,
         {Q17_QTY_FRAC!r} * ({_dsum('l_quantity')} / count(*)) AS qty_cut
  FROM brand_li GROUP BY 1)
SELECT round({_dsum('l_extendedprice')} / 7.0, 4) AS avg_yearly
FROM brand_li JOIN thresh USING (l_partkey)
WHERE l_quantity < qty_cut
"""

    q19_pred = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
        f" AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in Q19_BRANCHES
    )
    sql["disjunctive_revenue"] = f"""
SELECT {rev_expr} AS revenue, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {q19_pred}
"""

    sql["excess_volume_suppliers"] = f"""
WITH redvol AS (
  SELECT l_suppkey, {_dsum('l_quantity')} AS red_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
  GROUP BY 1)
SELECT s_suppkey, s_name, round(red_qty, 1) AS red_qty
FROM supplier
JOIN redvol ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q20_REGION}'
  AND red_qty > (SELECT {Q20_VOL_FACTOR!r}
                 * (CAST(SUM(CAST(red_qty AS {DEC})) AS DOUBLE) / count(*))
                 FROM redvol)
ORDER BY s_suppkey
"""

    q21_nations = ", ".join(f"'{n}'" for n in Q21_NATIONS)
    sql["waiting_suppliers"] = f"""
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
  AND n_name IN ({q21_nations})
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND o3.o_orderstatus = 'F'
                    AND l3.l_shipdate > o3.o_orderdate
                        + INTERVAL {Q21_LATE_DAYS} DAY)
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT {Q21_TOPN}
"""

    sql["idle_rich_customers"] = f"""
SELECT CAST(c_custkey % {Q22_CODE_MOD} AS VARCHAR) AS cntrycode,
       count(*) AS numcust,
       {_dsum('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT {_dsum('c_acctbal')} / count(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{Q22_IDLE_START}')
GROUP BY 1 ORDER BY 1
"""

    # BPE merge induction: replay the EXACT merge chain — word
    # histogram -> bracket-delimited symbol strings -> K rounds of
    # (pair count, argmax, literal replace). The bracket encoding
    # makes greedy merge application a plain replace() in both
    # engines (pattern '[a][b]' consumes its delimiters, so
    # left-to-right non-overlapping replace == BPE's application
    # rule); ties break (count desc, lhs, rhs) = binary ASCII in both.
    from .operators.text_analysis import BPE_EOW
    from .queries import BPE_N_MERGES

    # every CTE is MATERIALIZED: the reference tree (p{r} and v{r+1}
    # both read v{r}; the replace reads t{r} four times) otherwise
    # re-inlines each level multiplicatively — measured 200s+ for the
    # 6-round chain vs ~1s materialized
    bpe_ctes = [
        f"""v0 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS cnt,
         '[' || array_to_string(
           list_transform(range(1, length(word) + 1), i -> word[i]), '][')
           || '][{BPE_EOW}]' AS seq
  FROM (SELECT unnest(list_filter(
            list_transform(string_split(text, ' '),
                           t -> replace(replace(t, '[', ''), ']', '')),
            t -> t != ''))
          AS word FROM documents)
  GROUP BY word)"""
    ]
    for r in range(BPE_N_MERGES):
        bpe_ctes.append(
            f"""p{r} AS MATERIALIZED (
  SELECT string_split(pr, chr(9))[1] AS lhs,
         string_split(pr, chr(9))[2] AS rhs,
         SUM(cnt)::BIGINT AS pair_count
  FROM (SELECT cnt,
               unnest(list_transform(range(1, len(syms)),
                 i -> syms[i] || chr(9) || syms[i + 1])) AS pr
        FROM (SELECT cnt,
                     string_split(substr(seq, 2, length(seq) - 2), '][')
                       AS syms
              FROM v{r}))
  GROUP BY 1, 2),
t{r} AS MATERIALIZED (SELECT lhs, rhs, pair_count FROM p{r}
         ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
v{r + 1} AS MATERIALIZED (
  SELECT cnt,
         replace(seq,
           '[' || (SELECT lhs FROM t{r}) || '][' || (SELECT rhs FROM t{r}) || ']',
           '[' || (SELECT lhs FROM t{r}) || (SELECT rhs FROM t{r}) || ']') AS seq
  FROM v{r})"""
        )
    bpe_union = "\nUNION ALL\n".join(
        f"SELECT {r + 1}::INT AS merge_rank, lhs, rhs, lhs || rhs AS merged,"
        f" pair_count FROM t{r}"
        for r in range(BPE_N_MERGES)
    )
    sql["bpe_merges"] = (
        "WITH " + ",\n".join(bpe_ctes) + "\n" + bpe_union
    )

    # tokenizer application: reuse the learning CTE chain verbatim,
    # then run the same replace chain over the DISTINCT-WORD table and
    # join back to the corpus by word (mirrors operators.bpe_apply)
    enc_ctes = list(bpe_ctes)
    enc_ctes.append(
        f"""w0 AS MATERIALIZED (
  SELECT DISTINCT word,
         '[' || array_to_string(
           list_transform(range(1, length(word) + 1), i -> word[i]), '][')
           || '][{BPE_EOW}]' AS seq
  FROM (SELECT unnest(list_filter(
            list_transform(string_split(text, ' '),
                           t -> replace(replace(t, '[', ''), ']', '')),
            t -> t != ''))
          AS word FROM documents))"""
    )
    for r in range(BPE_N_MERGES):
        enc_ctes.append(
            f"""w{r + 1} AS MATERIALIZED (
  SELECT word,
         replace(seq,
           '[' || (SELECT lhs FROM t{r}) || '][' || (SELECT rhs FROM t{r}) || ']',
           '[' || (SELECT lhs FROM t{r}) || (SELECT rhs FROM t{r}) || ']') AS seq
  FROM w{r})"""
        )
    enc_ctes.append(
        f"""wt AS (
  SELECT word,
         (length(seq) - length(replace(seq, '[', '')))::BIGINT AS w_tokens,
         (length(word) + 1)::BIGINT AS w_base
  FROM w{BPE_N_MERGES})"""
    )
    enc_ctes.append(
        """d AS (
  SELECT doc_id,
         unnest(list_filter(
           list_transform(string_split(text, ' '),
                          t -> replace(replace(t, '[', ''), ']', '')),
           t -> t != '')) AS word
  FROM documents)"""
    )
    sql["bpe_encode"] = (
        "WITH "
        + ",\n".join(enc_ctes)
        + """
SELECT doc_id, count(*)::BIGINT AS n_words,
       SUM(w_tokens)::BIGINT AS n_tokens,
       SUM(w_base)::BIGINT AS n_base_symbols,
       round(SUM(w_base)::DOUBLE / SUM(w_tokens)::DOUBLE, 6) AS compression
FROM d JOIN wt USING (word)
GROUP BY doc_id
"""
    )

    # DSIR: same hashed-unigram buckets (md5 24-bit prefix), same
    # add-alpha smoothing; bucket log-ratios rounded to 9 dp BEFORE
    # the per-doc decimal-exact mean (ln may differ by an ulp across
    # engines), weight rounded to 6. All smoothing literals are
    # ::DOUBLE so DuckDB can't route the ratio through DECIMAL
    # division.
    from .queries import (
        DSIR_ALPHA,
        DSIR_BUCKETS,
        DSIR_TARGET_SOURCE,
    )

    _a = f"{DSIR_ALPHA!r}::DOUBLE"
    _ab = f"{DSIR_ALPHA * DSIR_BUCKETS!r}::DOUBLE"
    sql["dsir_select"] = f"""
WITH grams AS MATERIALIZED (
  SELECT doc_id, (source = '{DSIR_TARGET_SOURCE}') AS is_target,
         {_h24('gram')} % {DSIR_BUCKETS} AS bucket
  FROM (SELECT doc_id, source,
               unnest(list_filter(string_split(text, ' '), t -> t != ''))
                 AS gram
        FROM documents)),
counts AS (
  SELECT bucket, count(*)::BIGINT AS raw_cnt,
         SUM(CASE WHEN is_target THEN 1 ELSE 0 END)::BIGINT AS tgt_cnt
  FROM grams GROUP BY 1),
tot AS (SELECT SUM(raw_cnt)::BIGINT AS raw_total,
               SUM(tgt_cnt)::BIGINT AS tgt_total FROM counts),
stats AS (
  SELECT bucket,
         round(ln(((tgt_cnt + {_a}) / (tgt_total + {_ab}))
                / ((raw_cnt + {_a}) / (raw_total + {_ab}))), 9) AS log_ratio
  FROM counts, tot),
w0 AS (
  SELECT doc_id, count(*)::BIGINT AS n_grams,
         round(CAST(SUM(CAST(log_ratio AS DECIMAL(27,9))) AS DOUBLE)
               / count(*), 6) AS dsir_weight
  FROM grams JOIN stats USING (bucket)
  GROUP BY 1),
-- zero-token docs keep a row (n_grams 0, neutral weight 0.0) —
-- mirrors curation.dsir_weights' explode_outer (r10 review)
w AS MATERIALIZED (
  SELECT d.doc_id, coalesce(w0.n_grams, 0) AS n_grams,
         coalesce(w0.dsir_weight, 0.0) AS dsir_weight
  FROM (SELECT DISTINCT doc_id FROM documents) d
  LEFT JOIN w0 USING (doc_id))
SELECT doc_id, n_grams, dsir_weight,
       dsir_weight > (SELECT round(
           CAST(SUM(CAST(dsir_weight AS {DEC})) AS DOUBLE) / count(*), 6)
         FROM w) AS selected
FROM w
"""

    # DataSketches gates: exact values recomputed by DuckDB, gate
    # booleans re-asserted TRUE (invariant-row pattern, same as
    # approx_distinct_parts). quantile_cont == Spark percentile
    # (interpolated); rounded 6 both sides.
    sql["datasketch_gates"] = """
SELECT 'hll_direct' AS metric,
       count(DISTINCT l_partkey)::DOUBLE AS exact, TRUE AS err_ok
FROM lineitem
UNION ALL
SELECT 'hll_union_of_groups', count(DISTINCT l_partkey)::DOUBLE, TRUE
FROM lineitem
UNION ALL
SELECT 'kll_p50', round(quantile_cont(l_extendedprice, 0.5), 6), TRUE
FROM lineitem
UNION ALL
SELECT 'kll_p95', round(quantile_cont(l_extendedprice, 0.95), 6), TRUE
FROM lineitem
"""

    # time-series gap-fill: integer minute keys vs the fixed anchor,
    # rounded sums forward-filled with IGNORE NULLS — grid from
    # range(), same shapes as the Spark plan
    from .queries import (
        GAPFILL_ANCHOR_EPOCH,
        GAPFILL_MINUTES,
    )

    _gf_end = GAPFILL_ANCHOR_EPOCH + GAPFILL_MINUTES * 60
    sql["events_gapfill"] = f"""
WITH binned AS MATERIALIZED (
  SELECT event_type,
         (floor(epoch(ts))::BIGINT - {GAPFILL_ANCHOR_EPOCH}) // 60 AS minute,
         count(*)::BIGINT AS n,
         round({_dsum('value')}, 6) AS v
  FROM events
  WHERE epoch(ts) >= {GAPFILL_ANCHOR_EPOCH} AND epoch(ts) < {_gf_end}
  GROUP BY 1, 2),
grid AS (
  SELECT t.event_type, g.minute
  FROM (SELECT DISTINCT event_type FROM binned) t,
       (SELECT unnest(range(0, {GAPFILL_MINUTES})) AS minute) g),
joined AS (
  SELECT grid.event_type, grid.minute, b.n, b.v
  FROM grid LEFT JOIN binned b USING (event_type, minute))
SELECT event_type, minute,
       coalesce(n, 0)::BIGINT AS n_events,
       (n IS NULL) AS is_gap,
       v AS value_sum,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY minute
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM joined
"""

    # data profiling: every cell recomputed from scratch, one
    # UNION ALL branch per column
    prof_num = [
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    ]
    prof_str = ["l_returnflag", "l_linestatus"]
    branches = []
    for c in prof_num:
        branches.append(
            f"SELECT '{c}' AS column, "
            f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls, "
            f"count(DISTINCT {c})::BIGINT AS n_distinct, "
            f"round(min({c})::DOUBLE, 6) AS min_num, "
            f"round(max({c})::DOUBLE, 6) AS max_num, "
            f"NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str "
            f"FROM lineitem"
        )
    for c in prof_str:
        branches.append(
            f"SELECT '{c}', "
            f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT, "
            f"count(DISTINCT {c})::BIGINT, NULL::DOUBLE, NULL::DOUBLE, "
            f"min({c}), max({c}) FROM lineitem"
        )
    branches.append(
        "SELECT 'l_shipdate', "
        "SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)::BIGINT, "
        "count(DISTINCT l_shipdate)::BIGINT, NULL::DOUBLE, NULL::DOUBLE, "
        "strftime(min(l_shipdate), '%Y-%m-%d'), "
        "strftime(max(l_shipdate), '%Y-%m-%d') FROM lineitem"
    )
    sql["profile_lineitem"] = "\nUNION ALL\n".join(branches)

    # quality gates: violation counts recomputed per rule
    sql["quality_gates"] = """
WITH n AS (SELECT count(*)::BIGINT AS n_rows FROM lineitem)
SELECT 'quantity_in_1_50' AS rule, n_rows,
       (SELECT count(*) FROM lineitem
        WHERE NOT (l_quantity BETWEEN 1 AND 50))::BIGINT AS n_violations,
       (SELECT count(*) FROM lineitem
        WHERE NOT (l_quantity BETWEEN 1 AND 50)) = 0 AS ok FROM n
UNION ALL
SELECT 'discount_in_0_0.1', n_rows,
       (SELECT count(*) FROM lineitem
        WHERE NOT (l_discount BETWEEN 0.0 AND 0.1))::BIGINT,
       (SELECT count(*) FROM lineitem
        WHERE NOT (l_discount BETWEEN 0.0 AND 0.1)) = 0 FROM n
UNION ALL
SELECT 'returnflag_in_domain', n_rows,
       (SELECT count(*) FROM lineitem
        WHERE l_returnflag NOT IN ('A', 'N', 'R'))::BIGINT,
       (SELECT count(*) FROM lineitem
        WHERE l_returnflag NOT IN ('A', 'N', 'R')) = 0 FROM n
UNION ALL
SELECT 'extendedprice_positive', n_rows,
       (SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0)::BIGINT,
       (SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0) = 0 FROM n
UNION ALL
SELECT 'lineitem_has_order', n_rows,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_orderkey = l.l_orderkey))::BIGINT,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_orderkey = l.l_orderkey)) = 0 FROM n
UNION ALL
SELECT 'ship_on_or_after_order',
       (SELECT count(*) FROM lineitem JOIN orders
          ON l_orderkey = o_orderkey)::BIGINT,
       (SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate < o_orderdate)::BIGINT,
       (SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate < o_orderdate) = 0 FROM n
"""

    # flagship E1 (round 8): the entry() chain — documents -> chunk at
    # the reference's 2000/100 defaults -> deterministic embed ->
    # stable ids -> source-filtered cosine top-10 — replayed end to
    # end, so the one query the driver runs BY NAME is also
    # hash-certified (r7 verdict item 2a). Same normalize/cosine
    # arithmetic as the certified pipeline_vectors/rag_pipeline rows.
    _fsrcs = ", ".join(f"'src{i}'" for i in range(10))
    sql["flagship_e1"] = f"""
WITH fchunks AS ({_chunks_cte(extra_cols=', source', size=2000, overlap=100)}),
femb AS (
  SELECT 'doc-' || doc_id || '-' || chunk_index AS id,
         doc_id, chunk_index, source,
         {_det_embed('chunk_text', EMBED_DIM)} AS rv
  FROM fchunks
  WHERE source IN ({_fsrcs})),
fnv AS (
  SELECT id, doc_id, chunk_index, source,
         list_transform(rv, x -> x / n) AS v
  FROM (SELECT *, sqrt(list_sum(list_transform(rv, x -> x * x))) AS n
        FROM femb)),
fq AS (SELECT {_vec_literal(det_embed_py(QUERY_TEXT, EMBED_DIM))} AS qv),
scored AS (
  SELECT id, doc_id, chunk_index, source, {_cos('v', 'fq.qv', EMBED_DIM)} AS s
  FROM fnv CROSS JOIN fq)
SELECT id, doc_id, chunk_index, source, round(s, 6) AS score
FROM scored ORDER BY s DESC, id LIMIT 10
"""

    # store-contract gate (round 8): the oracle recomputes the stored
    # payload digest from raw parquet and asserts every contract
    # boolean TRUE + exactly 3 builds — a store serving stale or
    # partial bytes, a cache miss, or a crash on the malformed marker
    # all become hash mismatches
    sql["store_consistency_gate"] = f"""
SELECT source, count(*)::BIGINT AS n_docs,
       SUM(doc_id)::BIGINT AS sum_ids,
       SUM({_h24('text')})::BIGINT AS sum_text_hash,
       TRUE AS built_once, TRUE AS cached_serve_identical,
       TRUE AS salt_change_rebuilt, TRUE AS malformed_marker_rebuilt,
       3::BIGINT AS builds_total
FROM documents GROUP BY source
"""

    # equi-depth-by-range gate (round 8): exact percentiles + ntile
    # bin bounds recomputed here; the Spark side's approx-cut and
    # range-bin-balance gates are asserted TRUE
    _eqps = ", ".join(repr(i / HIST_BINS) for i in range(1, HIST_BINS))
    sql["equidepth_by_range"] = f"""
WITH b AS (
  SELECT value, ntile({HIST_BINS}) OVER (ORDER BY value, event_id) AS bin
  FROM events),
bounds AS (
  SELECT bin, min(value) AS lo, max(value) AS hi FROM b GROUP BY bin),
e AS (SELECT quantile_cont(value, [{_eqps}]) AS qs, count(*)::BIGINT AS n
      FROM events),
ranks AS (SELECT unnest(range(1, {HIST_BINS})) AS cut_rank)
SELECT r.cut_rank::INT AS cut_rank,
       round(e.qs[r.cut_rank::INT], 6) AS exact_cut,
       round(bl.hi, 6) AS hi_below,
       round(bu.lo, 6) AS lo_above,
       TRUE AS approx_near_exact,
       TRUE AS approx_separates_bins,
       TRUE AS bins_balanced,
       e.n AS n_rows
FROM ranks r CROSS JOIN e
JOIN bounds bl ON bl.bin = r.cut_rank
JOIN bounds bu ON bu.bin = r.cut_rank + 1
"""

    return sql
