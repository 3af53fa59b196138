"""Distributed BM25 top-k search (SURVEY.md §3.1 Spark lifecycle).

Pipeline per query:

1. parse + sanitize (T8/T9) → AND-of-OR groups        [driver]
2. dictionary lookup, partition-pruned by term bucket; prefix atoms use a
   ``term >= p AND term < p+MAX`` range (pushed to parquet min/max);
   prefix expansion capped at EXPANSION_LIMIT most-frequent terms
   (Sphinx expansion_limit semantics) → concrete terms + df stats +
   bucket ids (no extra job: the dictionary rows carry their bucket)
3. idf per term computed on the driver (constant folding — the analog of
   the reference's client-side maxScore precompute, Q14)
4. postings scan: bucket-pruned, term-pruned, attribute filter (Q6)
   pushed into the parquet scan; tombstone anti-join only when
   tombstones exist (meta fast path)
5. ONE shuffle: repartition by docid → mapInPandas scorer — fully
   numpy-vectorized: batch varbyte decode of ALL position lists in one
   pass, phrase adjacency via sorted-code intersections, LCS chain DP
   as n_groups vectorized rounds; no per-document Python loop
6. ORDER BY (Q9) + LIMIT/OFFSET (Q10) → TakeOrderedAndProject
7. hydration broadcast join back to the docs table (S8), rank preserved
   (Q15)

The reference delegates all of this to searchd over one SphinxQL string
(SphinxSearchEngine_class.php:106-123); here the same contract is a
declarative Spark plan plus one Arrow-vectorized scoring stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from sphinxsearchengine_spark import codec
from sphinxsearchengine_spark.config import (
    BM25_K1,
    EXACT_PREFIX,
    EXPANSION_LIMIT,
    FIELD_NAMES,
    FIELD_WEIGHTS,
    MATCH_CAP,
)
from sphinxsearchengine_spark.index.layout import IndexLayout
from sphinxsearchengine_spark.query import ranker
from sphinxsearchengine_spark.query.parser import Query, parse_query
from sphinxsearchengine_spark.text.tokenizer import stem_token

_MAX_CHAR = "￿"
_POS_BITS = 21  # 2 MB field cap → < 2^21 token positions

SCORED_SCHEMA = (
    "docid long, weight_raw double, score double, bm25 double, prox double, "
    "fresh double, lang string, date_insert long, date_modify long"
)

RESULT_COLS = [
    "rank", "docid", "score", "weight_raw", "repo", "path", "commit", "lang",
    "content_sha", "category", "date_insert", "date_modify",
]


def _live_union(spark: SparkSession, layout: IndexLayout, sub: str) -> DataFrame | None:
    """Union one sub-table (postings/dict/docs) across live segments with
    a seq column; newest-segment-wins and tombstones applied by callers."""
    meta = layout.meta
    dfs = []
    for seg in meta.segments:
        path = getattr(layout, sub)(seg["name"])
        dfs.append(spark.read.parquet(path).withColumn("seq", F.lit(seg["seq"])))
    if not dfs:
        return None
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _apply_tombstones(spark, layout: IndexLayout, df: DataFrame) -> DataFrame:
    ts = spark.read.parquet(layout.tombstones())
    cond = (df.docid == ts.docid) & (df.seq < ts.asof_seq)
    return df.join(F.broadcast(ts), cond, "left_anti")


def live_docs(spark: SparkSession, index_dir: str) -> DataFrame:
    """Current visible document set (newest segment wins, tombstones out).

    Fast path: a freshly-built/compacted index (one segment, no
    tombstones) is a plain parquet scan — no window, no anti-join.
    """
    layout = IndexLayout(index_dir)
    meta = layout.meta
    if len(meta.segments) == 1 and meta.n_tombstones == 0:
        return spark.read.parquet(layout.docs(meta.segments[0]["name"]))

    from pyspark.sql import Window

    docs = _live_union(spark, layout, "docs")
    if meta.n_tombstones:
        docs = _apply_tombstones(spark, layout, docs)
    w = Window.partitionBy("docid").orderBy(F.col("seq").desc())
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "seq")
    )


def _expand_groups(spark, layout, query: Query):
    """Steps 2-3: dict lookup → per-(term, gid) mapping + idf constants.

    Returns (mapping_rows, stats, buckets):
    mapping_rows = [(term, gid, idf, is_phrase_member, member_idx, fld)],
    stats = {term: (df, hits, max_tf)}, buckets = postings partitions to scan.
    """
    exact_terms: set[str] = set()
    prefixes: set[str] = set()
    for g in query.groups:
        for a in g.alts:
            if a.kind == "kw":
                w = a.words[0]
                exact_terms.add(stem_token(w))
                exact_terms.add(EXACT_PREFIX + w)
                prefixes.add(w)  # expand_keywords=1 → kw* too
            elif a.kind == "exact":
                exact_terms.add(EXACT_PREFIX + a.words[0])
            elif a.kind == "prefix":
                prefixes.add(a.words[0])
            else:  # phrase
                exact_terms.update(stem_token(w) for w in a.words)

    dic = _live_union(spark, layout, "dict")
    cond = F.col("term").isin(list(exact_terms)) if exact_terms else F.lit(False)
    for p in sorted(prefixes):
        cond = cond | ((F.col("term") >= p) & (F.col("term") < p + _MAX_CHAR))
    dic_pdf = (
        dic.filter(cond)
        .groupBy("term")
        .agg(
            F.sum("df").alias("df"),
            F.sum("hits").alias("hits"),
            F.max("max_tf").alias("max_tf"),
            F.first("bucket").alias("bucket"),
        )
        .toPandas()
    )
    stats = {
        r.term: (int(r.df), int(r.hits), int(r.max_tf))
        for r in dic_pdf.itertuples(index=False)
    }
    bucket_of = {r.term: int(r.bucket) for r in dic_pdf.itertuples(index=False)}

    n_docs = layout.meta.n_docs
    nk = len(query.groups)
    mapping: list[tuple] = []

    def add(term: str, gid: int, is_pm: int, midx: int, fld: int):
        if term in stats:
            mapping.append(
                (term, gid, ranker.idf(stats[term][0], n_docs, nk), is_pm, midx, fld)
            )

    def prefix_expand(w: str, exclude: set[str]) -> list[str]:
        """Top-EXPANSION_LIMIT most-frequent dict terms with prefix w
        (deterministic: df desc, term asc) — Sphinx expansion_limit."""
        cand = [
            t for t in stats
            if t.startswith(w) and not t.startswith(EXACT_PREFIX) and t not in exclude
        ]
        cand.sort(key=lambda t: (-stats[t][0], t))
        return cand[:EXPANSION_LIMIT]

    for gid, g in enumerate(query.groups):
        for a in g.alts:
            if a.kind == "kw":
                w = a.words[0]
                seen = {stem_token(w), EXACT_PREFIX + w}
                add(stem_token(w), gid, 0, -1, g.field)
                add(EXACT_PREFIX + w, gid, 0, -1, g.field)
                for t in prefix_expand(w, seen):
                    add(t, gid, 0, -1, g.field)
            elif a.kind == "exact":
                add(EXACT_PREFIX + a.words[0], gid, 0, -1, g.field)
            elif a.kind == "prefix":
                for t in prefix_expand(a.words[0], set()):
                    add(t, gid, 0, -1, g.field)
            else:
                for i, w in enumerate(a.words):
                    add(stem_token(w), gid, 1, i, g.field)
    buckets = sorted({bucket_of[m[0]] for m in mapping})
    return mapping, stats, buckets


def _decode_all(pr: pd.DataFrame):
    """Vectorized varbyte decode of every pos_vb in the frame.

    Returns (row_of_val, positions): for each decoded position, the
    source row index and the absolute (1-based) token position.
    """
    bufs = list(pr["pos_vb"])
    byte_lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    big = b"".join(bufs)
    deltas = codec.vb_decode(big).astype(np.int64)
    b_arr = np.frombuffer(big, dtype=np.uint8)
    is_last = (b_arr & 0x80) == 0
    row_of_byte = np.repeat(np.arange(len(bufs)), byte_lens)
    row_of_val = row_of_byte[is_last]
    total = np.cumsum(deltas)
    val_counts = np.bincount(row_of_val, minlength=len(bufs))
    row_starts = np.concatenate(([0], np.cumsum(val_counts)[:-1]))
    base = np.where(row_starts > 0, total[row_starts - 1], 0)
    positions = total - np.repeat(base, val_counts)
    return row_of_val, positions


def _make_scorer(n_groups: int, phrase_groups: dict[int, int], now_ts: int,
                 weights_by_fid: list[int]):
    """Partition scorer, fully numpy-vectorized (no per-doc Python loop):
    BM25 + AND first; positions decoded in ONE batch pass only for AND
    survivors; phrase adjacency and LCS chain DP as per-group vector
    rounds over (docid,field,pos) codes."""
    k1 = BM25_K1
    w_fid = np.asarray(weights_by_fid, dtype=np.float64)
    mls = float(ranker.max_lcs(n_groups))
    from sphinxsearchengine_spark.config import PROXIMITY_SCALE

    def score_partition(pdf_iter):
        chunks = list(pdf_iter)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return

        # --- BM25 (doc-level tf across fields, per (docid,gid,term)) ----
        per_term = (
            pdf.groupby(["docid", "gid", "term"], sort=False)
            .agg(tfd=("tf", "sum"), idf=("idf", "first"))
            .reset_index()
        )
        per_term["contrib"] = per_term["idf"] * per_term["tfd"] / (per_term["tfd"] + k1)
        bm25_raw = per_term.groupby("docid", sort=False)["contrib"].sum()

        # --- AND matching over non-phrase groups -------------------------
        need_np = [g for g in range(n_groups) if g not in phrase_groups]
        if need_np:
            dg = pdf.loc[pdf["is_pm"] == 0, ["docid", "gid"]].drop_duplicates()
            cnt = dg.groupby("docid", sort=False).size()
            surv = cnt[cnt == len(need_np)].index.to_numpy()
        else:
            surv = pdf["docid"].unique()
        if surv.size == 0:
            return
        pr = pdf[pdf["docid"].isin(surv)].reset_index(drop=True)

        # --- one-pass positional decode ----------------------------------
        row_of_val, positions = _decode_all(pr)
        docid_v = pr["docid"].to_numpy()[row_of_val]
        gid_v = pr["gid"].to_numpy()[row_of_val]
        fld_v = pr["field"].to_numpy()[row_of_val]
        midx_v = pr["midx"].to_numpy()[row_of_val]
        ispm_v = pr["is_pm"].to_numpy()[row_of_val]
        pairs = np.stack([docid_v, fld_v.astype(np.int64)], axis=1)
        uniq, key_of_val = np.unique(pairs, axis=0, return_inverse=True)
        code = (key_of_val.astype(np.int64) << _POS_BITS) | positions

        # --- phrase validation (vector intersections per member) ---------
        alive = surv
        starts_by_gid: dict[int, np.ndarray] = {}
        for gid, nmem in phrase_groups.items():
            sel = (gid_v == gid) & (ispm_v == 1)
            starts = np.unique(code[sel & (midx_v == 0)])
            for mi in range(1, nmem):
                smi = sel & (midx_v == mi) & (positions > mi)
                aligned = np.unique(code[smi] - mi)
                starts = starts[np.isin(starts, aligned, assume_unique=True)]
                if starts.size == 0:
                    break
            starts_by_gid[gid] = starts
            ok_docs = np.unique(uniq[np.unique(starts >> _POS_BITS), 0])
            alive = alive[np.isin(alive, ok_docs)]
            if alive.size == 0:
                return
        alive_set = set(alive.tolist())

        # --- LCS chain DP: n_groups vector rounds --------------------------
        best_arr = np.zeros(len(uniq), dtype=np.int32)
        prev_codes = np.empty(0, dtype=np.int64)
        prev_lens = np.empty(0, dtype=np.int32)
        for g in range(n_groups):
            if g in phrase_groups:
                cur = starts_by_gid[g]
            else:
                cur = np.unique(code[(gid_v == g) & (ispm_v == 0)])
            if cur.size == 0:
                prev_codes = np.empty(0, dtype=np.int64)
                prev_lens = np.empty(0, dtype=np.int32)
                continue
            lens = np.ones(cur.size, dtype=np.int32)
            if prev_codes.size:
                idx = np.searchsorted(prev_codes, cur - 1)
                idxc = np.clip(idx, 0, prev_codes.size - 1)
                hit = prev_codes[idxc] == (cur - 1)
                lens = np.where(hit, prev_lens[idxc] + 1, 1).astype(np.int32)
            np.maximum.at(best_arr, cur >> _POS_BITS, lens)
            prev_codes, prev_lens = cur, lens

        # --- assemble scores ------------------------------------------------
        lcs_df = pd.DataFrame(
            {
                "docid": uniq[:, 0],
                "wl": best_arr.astype(np.float64) * w_fid[uniq[:, 1]],
            }
        )
        wsum = lcs_df.groupby("docid", sort=False)["wl"].sum()
        att = pr.drop_duplicates("docid").set_index("docid")[
            ["lang", "date_insert", "date_modify"]
        ]
        out = att.join(wsum.rename("wsum"), how="left").join(
            bm25_raw.rename("raw"), how="left"
        )
        if phrase_groups:
            out = out[out.index.isin(alive_set)]
        if out.empty:
            return
        # drop docs with zero matched positions overall (defensive)
        out = out.fillna({"wsum": 0.0, "raw": 0.0})
        prox = out["wsum"].to_numpy() / mls * PROXIMITY_SCALE
        bm = (out["raw"].to_numpy() + 0.5) * 999
        dates = out[["date_insert", "date_modify"]].to_numpy(dtype=np.float64)
        age = now_ts - dates.sum(axis=1) / 2.0
        freshb = np.maximum(1.0 - age / 47_304_000, 0.0)
        fresh = 1000.0 * freshb**4
        raw_w = prox + bm + fresh
        res = pd.DataFrame(
            {
                "docid": out.index.to_numpy(),
                "weight_raw": raw_w,
                "score": raw_w / ranker.max_score(n_groups),
                "bm25": bm,
                "prox": prox,
                "fresh": fresh,
                "lang": out["lang"].to_numpy(),
                "date_insert": out["date_insert"].to_numpy(),
                "date_modify": out["date_modify"].to_numpy(),
            }
        )
        yield res

    return score_partition


def score_matches(
    spark: SparkSession,
    index_dir: str,
    query: Query | str,
    langs: list[str] | None = None,
    now_ts: int = 0,
) -> DataFrame:
    """Match + score all documents for `query`; returns the scored set
    (docid, weight_raw, score, …) BEFORE ordering/limit."""
    if isinstance(query, str):
        query = parse_query(query)
    layout = IndexLayout(index_dir)
    if query.blank or not query.groups:
        return spark.createDataFrame([], SCORED_SCHEMA)

    meta = layout.meta
    mapping, _stats, buckets = _expand_groups(spark, layout, query)
    if not mapping:
        return spark.createDataFrame([], SCORED_SCHEMA)
    # not every group found in dict → AND can never be satisfied
    gids_present = {m[1] for m in mapping}
    if len(gids_present) < len(query.groups):
        return spark.createDataFrame([], SCORED_SCHEMA)

    terms = sorted({m[0] for m in mapping})
    map_df = spark.createDataFrame(
        mapping, "term string, gid int, idf double, is_pm int, midx int, fld int"
    )

    post = _live_union(spark, layout, "postings")
    post = post.filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
    if langs:
        post = post.filter(F.col("lang").isin(langs))  # Q6 pushdown
    if meta.n_tombstones:
        post = _apply_tombstones(spark, layout, post)
    # newest-segment-wins for updated docs: drop postings of docids that
    # appear in a newer segment (upsert supersedes, SURVEY.md §3.2)
    if len(meta.segments) > 1:
        docs_union = _live_union(spark, layout, "docs")
        if meta.n_tombstones:
            docs_union = _apply_tombstones(spark, layout, docs_union)
        docs_seq = docs_union.groupBy("docid").agg(F.max("seq").alias("mseq"))
        post = post.join(F.broadcast(docs_seq), "docid", "left").filter(
            F.col("seq") == F.col("mseq")
        ).drop("mseq")

    cand = post.join(F.broadcast(map_df), "term")
    cand = cand.filter((F.col("fld") == -1) | (F.col("field") == F.col("fld")))

    phrase_groups = {
        gid: len(g.alts[0].words)
        for gid, g in enumerate(query.groups)
        if g.alts and g.alts[0].kind == "phrase"
    }
    weights_by_fid = [FIELD_WEIGHTS[name] for name in FIELD_NAMES]
    scorer = _make_scorer(len(query.groups), phrase_groups, now_ts, weights_by_fid)

    shuffle_n = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    scored = (
        cand.select(
            "docid", "term", "gid", "idf", "is_pm", "midx", "field", "tf",
            "pos_vb", "lang", "date_insert", "date_modify",
        )
        .repartition(shuffle_n, "docid")
        .mapInPandas(scorer, schema=SCORED_SCHEMA)
    )
    return scored


_ORDER_COLS = {"weight": "weight_raw", "date_insert": "date_insert",
               "date_modify": "date_modify"}


def search(
    spark: SparkSession,
    index_dir: str,
    query: Query | str,
    limit: int = 20,
    offset: int = 0,
    langs: list[str] | None = None,
    order_by: str = "weight",
    sort: str = "desc",
    now_ts: int = 0,
) -> DataFrame:
    """Full search path → hydrated top-k result DataFrame (rank-ordered).

    order_by/sort whitelist mirrors SphinxSearchEngine_class.php:16-18;
    limit is capped at MATCH_CAP (the reference's limit=1000, :169).
    """
    limit = min(limit, MATCH_CAP)
    scored = score_matches(spark, index_dir, query, langs, now_ts)
    col = _ORDER_COLS.get(order_by, "weight_raw")
    ordc = F.col(col).desc() if sort == "desc" else F.col(col).asc()
    topk = scored.orderBy(ordc, F.col("docid").asc()).limit(offset + limit)
    # offset on the already-truncated set (Q10)
    from pyspark.sql import Window

    w = Window.orderBy(ordc, F.col("docid").asc())
    topk = (
        topk.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") > offset)
    )
    docs = live_docs(spark, index_dir).select(
        "docid", "repo", "path", "commit", "content_sha", "category"
    )
    out = docs.join(
        F.broadcast(topk.select("rank", "docid", "score", "weight_raw", "lang",
                                "date_insert", "date_modify")),
        "docid",
    )
    return out.select(*RESULT_COLS).orderBy("rank")  # Q15 rank preserved


def search_with_meta(spark, index_dir, query, **kw):
    """search + SHOW META analog (Q11 total, Q12 per-keyword stats)."""
    if isinstance(query, str):
        query = parse_query(query)
    layout = IndexLayout(index_dir)
    res = search(spark, index_dir, query, **kw)
    meta: dict = {"total": 0, "keywords": []}
    if not query.blank and query.groups:
        scored = score_matches(
            spark, index_dir, query, kw.get("langs"), kw.get("now_ts", 0)
        )
        meta["total"] = scored.count()
        _, stats, _b = _expand_groups(spark, layout, query)
        for g in query.groups:
            for a in g.alts:
                w0 = a.words[0]
                t = EXACT_PREFIX + w0 if a.kind == "exact" else stem_token(w0)
                df_, hits, _mt = stats.get(t, (0, 0, 0))
                meta["keywords"].append({"keyword": w0, "docs": df_, "hits": hits})
    return res, meta
