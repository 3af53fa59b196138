"""Distributed BM25 top-k search (SURVEY.md §3.1 Spark lifecycle).

Pipeline per query:

1. parse + sanitize (T8/T9) → AND-of-OR groups        [driver]
2. dictionary lookup, partition-pruned by term bucket; prefix atoms use a
   ``term >= p AND term < p+MAX`` range (pushed to parquet min/max)
   → concrete term list + df/hits stats               [tiny Spark job]
3. idf per term computed on the driver (constant folding — the analog of
   the reference's client-side maxScore precompute, Q14)
4. postings scan: bucket-pruned, term-pruned, attribute filter (Q6)
   pushed into the parquet scan; tombstone anti-join
5. ONE shuffle: repartition by docid → mapInPandas scorer:
   vectorized BM25 + AND-matching first, positions decoded ONLY for
   docs that survive the AND filter (phrase adjacency Q4, LCS proximity
   Q7) — the expensive positional work runs on the small survivor set
6. ORDER BY (Q9) + LIMIT/OFFSET (Q10) → TakeOrderedAndProject
7. hydration broadcast join back to the docs table (S8), rank preserved
   (Q15)

The reference delegates all of this to searchd over one SphinxQL string
(SphinxSearchEngine_class.php:106-123); here the same contract is a
declarative Spark plan plus one Arrow-vectorized scoring stage.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from sphinxsearchengine_spark import codec
from sphinxsearchengine_spark.config import (
    BM25_K1,
    EXACT_PREFIX,
    FIELD_NAMES,
    FIELD_WEIGHTS,
    MATCH_CAP,
)
from sphinxsearchengine_spark.index.layout import IndexLayout
from sphinxsearchengine_spark.query import ranker
from sphinxsearchengine_spark.query.parser import Query, parse_query
from sphinxsearchengine_spark.text.tokenizer import stem_token

_MAX_CHAR = "￿"

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
    if ts.isEmpty():
        return df
    cond = (df.docid == ts.docid) & (df.seq < ts.asof_seq)
    return df.join(F.broadcast(ts), cond, "left_anti")


def live_docs(spark: SparkSession, index_dir: str) -> DataFrame:
    """Current visible document set (newest segment wins, tombstones out)."""
    from pyspark.sql import Window

    layout = IndexLayout(index_dir)
    docs = _apply_tombstones(spark, layout, _live_union(spark, layout, "docs"))
    w = Window.partitionBy("docid").orderBy(F.col("seq").desc())
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "seq")
    )


def _expand_groups(spark, layout, query: Query, nb: int):
    """Steps 2-3: dict lookup → per-(term, gid) mapping + idf constants.

    Returns (mapping_rows, stats) where mapping_rows =
    [(term, gid, idf, is_phrase_member, member_idx, field_restrict)],
    stats = {term: (df, hits)}.
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
        .agg(F.sum("df").alias("df"), F.sum("hits").alias("hits"),
             F.max("max_tf").alias("max_tf"))
        .toPandas()
    )
    stats = {
        r.term: (int(r.df), int(r.hits), int(r.max_tf))
        for r in dic_pdf.itertuples(index=False)
    }

    n_docs = layout.meta.n_docs
    nk = len(query.groups)
    mapping: list[tuple] = []

    def add(term: str, gid: int, is_pm: int, midx: int, fld: int):
        if term in stats:
            mapping.append(
                (term, gid, ranker.idf(stats[term][0], n_docs, nk), is_pm, midx, fld)
            )

    for gid, g in enumerate(query.groups):
        for a in g.alts:
            if a.kind == "kw":
                w = a.words[0]
                seen = {stem_token(w), EXACT_PREFIX + w}
                add(stem_token(w), gid, 0, -1, g.field)
                add(EXACT_PREFIX + w, gid, 0, -1, g.field)
                for t in stats:
                    if t.startswith(w) and not t.startswith(EXACT_PREFIX) and t not in seen:
                        add(t, gid, 0, -1, g.field)
            elif a.kind == "exact":
                add(EXACT_PREFIX + a.words[0], gid, 0, -1, g.field)
            elif a.kind == "prefix":
                w = a.words[0]
                for t in stats:
                    if t.startswith(w) and not t.startswith(EXACT_PREFIX):
                        add(t, gid, 0, -1, g.field)
            else:
                for i, w in enumerate(a.words):
                    add(stem_token(w), gid, 1, i, g.field)
    return mapping, stats


def _make_scorer(n_groups: int, phrase_groups: dict[int, int], now_ts: int,
                 weights_by_fid: list[int]):
    """Build the partition scorer: vectorized BM25/AND first, positional
    work (phrase validation + LCS) only on AND survivors."""
    k1 = BM25_K1

    def score_partition(pdf_iter):
        chunks = list(pdf_iter)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)  # partition == candidate
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

        # --- AND matching (tf-level; phrases validated positionally) ----
        nonphrase = pdf[pdf["is_pm"] == 0]
        matched = (
            nonphrase.groupby("docid", sort=False)["gid"].agg(set)
            if not nonphrase.empty
            else pd.Series(dtype=object)
        )
        cand: dict[int, set] = matched.to_dict()
        # docs where all non-phrase groups matched (phrase groups are
        # validated positionally below, on this reduced survivor set)
        need_nonphrase = set(range(n_groups)) - set(phrase_groups)
        if need_nonphrase:
            survivors = [d for d, gids in cand.items() if need_nonphrase <= gids]
        else:
            survivors = list(pdf["docid"].unique())
        if not survivors:
            return
        surv_set = set(survivors)

        # --- positional pass on survivors only ---------------------------
        pos_rows = pdf[pdf["docid"].isin(surv_set)]
        # decode positions: gid -> field -> docid -> sorted positions
        results = []
        for docid, doc_pdf in pos_rows.groupby("docid", sort=False):
            # group positions per (gid, field)
            by_gf: dict[tuple, dict] = {}
            for r in doc_pdf.itertuples(index=False):
                positions = codec.delta_decode(bytes(r.pos_vb))
                key = (r.gid, r.field)
                slot = by_gf.setdefault(key, {})
                slot.setdefault(r.midx, set()).update(int(p) for p in positions)
            ok = True
            # validate phrase groups: adjacency of members in some field
            group_field_pos: dict[int, dict[int, list]] = {}
            for gid in range(n_groups):
                gf: dict[int, list] = {}
                if gid in phrase_groups:
                    nmem = phrase_groups[gid]
                    found = False
                    for (g2, fld), slot in by_gf.items():
                        if g2 != gid or len(slot) < nmem:
                            continue
                        starts = slot.get(0, set())
                        for mi in range(1, nmem):
                            starts = {
                                p for p in starts if (p + mi) in slot.get(mi, set())
                            }
                            if not starts:
                                break
                        if starts:
                            gf[fld] = sorted(starts)
                            found = True
                    if not found:
                        ok = False
                        break
                else:
                    for (g2, fld), slot in by_gf.items():
                        if g2 == gid:
                            allpos: set = set()
                            for s in slot.values():
                                allpos |= s
                            if allpos:
                                gf[fld] = sorted(allpos)
                if gf:
                    group_field_pos[gid] = gf
            if not ok or len(group_field_pos) < n_groups:
                continue
            # LCS per field → weighted sum (Q7/Q8)
            wsum = 0.0
            fields_present = {
                fld for gf in group_field_pos.values() for fld in gf
            }
            for fld in fields_present:
                per_group = {
                    g: gf[fld]
                    for g, gf in group_field_pos.items()
                    if fld in gf
                }
                lcs = ranker.lcs_of_field(per_group, n_groups)
                wsum += weights_by_fid[fld] * lcs
            prox = ranker.proximity_score(wsum, n_groups)
            bm = ranker.bm25_scale(float(bm25_raw.get(docid, 0.0)))
            first = doc_pdf.iloc[0]
            fresh = ranker.freshness(
                now_ts, int(first["date_insert"]), int(first["date_modify"])
            )
            raw = prox + bm + fresh
            results.append(
                (
                    int(docid), raw, raw / ranker.max_score(n_groups), bm, prox,
                    fresh, first["lang"], int(first["date_insert"]),
                    int(first["date_modify"]),
                )
            )
        if results:
            yield pd.DataFrame(
                results,
                columns=[
                    "docid", "weight_raw", "score", "bm25", "prox", "fresh",
                    "lang", "date_insert", "date_modify",
                ],
            )

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

    nb = layout.meta.term_buckets
    mapping, _stats = _expand_groups(spark, layout, query, nb)
    if not mapping:
        return spark.createDataFrame([], SCORED_SCHEMA)
    # not every group found in dict → AND can never be satisfied
    gids_present = {m[1] for m in mapping}
    if len(gids_present) < len(query.groups):
        return spark.createDataFrame([], SCORED_SCHEMA)

    terms = sorted({m[0] for m in mapping})
    # bucket ids computed with the same hash as the build (tiny Spark job)
    bpdf = spark.createDataFrame(
        [(t,) for t in terms], "term string"
    ).select("term", F.pmod(F.xxhash64("term"), F.lit(nb)).cast("int").alias("b"))
    buckets = sorted({r.b for r in bpdf.collect()})

    map_df = spark.createDataFrame(
        mapping, "term string, gid int, idf double, is_pm int, midx int, fld int"
    )

    post = _live_union(spark, layout, "postings")
    post = post.filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
    if langs:
        post = post.filter(F.col("lang").isin(langs))  # Q6 pushdown
    post = _apply_tombstones(spark, layout, post)
    # newest-segment-wins for updated docs: drop postings of docids that
    # appear in a newer segment (upsert supersedes, SURVEY.md §3.2)
    meta = layout.meta
    if len(meta.segments) > 1:
        docs_seq = _apply_tombstones(
            spark, layout, _live_union(spark, layout, "docs")
        ).groupBy("docid").agg(F.max("seq").alias("mseq"))
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
    if not query.blank:
        scored = score_matches(
            spark, index_dir, query, kw.get("langs"), kw.get("now_ts", 0)
        )
        meta["total"] = scored.count()
        _, stats = _expand_groups(spark, layout, query, layout.meta.term_buckets)
        for g in query.groups:
            for a in g.alts:
                w0 = a.words[0]
                t = EXACT_PREFIX + w0 if a.kind == "exact" else stem_token(w0)
                df_, hits, _mt = stats.get(t, (0, 0, 0))
                meta["keywords"].append({"keyword": w0, "docs": df_, "hits": hits})
    return res, meta
