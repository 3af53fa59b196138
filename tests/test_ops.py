"""Training-data ops unit tests (dedup / similarity / textstats /
multimodal) — semantics beyond what the DuckDB gate covers."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from sphinxsearchengine_spark.ops.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from sphinxsearchengine_spark.ops.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
    synth_media,
)
from sphinxsearchengine_spark.ops.similarity import (
    cosine_topk,
    lsh_topk,
    with_lsh_buckets,
)
from sphinxsearchengine_spark.ops.textstats import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + " today"),  # near dup of 1
        (4, "der hund läuft und die katze ist mit dem vogel"),
        (5, "completely different words about spark and indexes and queries"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "id long, text string")


class TestDedup:
    def test_exact(self, spark, docs):
        groups = exact_duplicates(docs, "id", "text").collect()
        dup = [g for g in groups if g.copies > 1]
        assert len(dup) == 1 and dup[0].keeper_id == 1 and dup[0].copies == 2

    def test_jaccard_finds_near_dup(self, spark, docs):
        pairs = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(docs, "id", "text", threshold=0.5).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
        assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
        assert (1, 5) not in pairs

    def test_minhash_agrees(self, spark, docs):
        pairs = {(r.id_a, r.id_b) for r in
                 minhash_lsh_pairs(docs, "id", "text", threshold=0.5).collect()}
        assert (1, 2) in pairs and (1, 5) not in pairs

    def test_simhash(self, spark, docs):
        pairs = {(r.id_a, r.id_b): r.hamming
                 for r in simhash_pairs(docs, "id", "text", max_hamming=3).collect()}
        assert pairs.get((1, 2)) == 0

    def test_simhash_paired_bands_same_pairs(self, spark, docs):
        """Scale blocking mode (5×13-bit chunk pairs) must return the
        identical pair set — only candidate generation differs."""
        base = {(r.id_a, r.id_b, r.hamming)
                for r in simhash_pairs(docs, "id", "text", max_hamming=3).collect()}
        paired = {(r.id_a, r.id_b, r.hamming)
                  for r in simhash_pairs(docs, "id", "text", max_hamming=3,
                                         paired_bands=True).collect()}
        assert base == paired

    def test_simhash_auto_mode_switch(self, spark, docs, monkeypatch):
        """'auto' (default) picks 16-bit banding under the threshold and
        paired_bands above it — identical pairs either way."""
        import sphinxsearchengine_spark.ops.dedup as dd

        base = {(r.id_a, r.id_b, r.hamming)
                for r in simhash_pairs(docs, "id", "text", max_hamming=3,
                                       paired_bands=False).collect()}
        auto_small = {(r.id_a, r.id_b, r.hamming)
                      for r in simhash_pairs(docs, "id", "text",
                                             max_hamming=3).collect()}
        monkeypatch.setattr(dd, "SIMHASH_PAIRED_BANDS_MIN_DOCS", 0)
        auto_big = {(r.id_a, r.id_b, r.hamming)
                    for r in simhash_pairs(docs, "id", "text",
                                           max_hamming=3).collect()}
        assert base == auto_small == auto_big

    def test_jaccard_prefix_filter_vs_bruteforce(self, spark):
        """The prefix-filtered join must return EXACTLY the brute-force
        all-pairs result (numpy oracle) on a corpus with mixed overlap."""
        import itertools

        import numpy as np

        rng = np.random.RandomState(5)
        vocab = [f"w{i}" for i in range(30)]
        rows = []
        for i in range(40):
            n = 8 + int(rng.randint(0, 15))
            words = [vocab[rng.randint(0, 30)] for _ in range(n)]
            rows.append((i, " ".join(words)))
            if rng.randint(0, 3) == 0:  # planted near-dup
                mutated = list(words)
                mutated[rng.randint(0, n)] = vocab[rng.randint(0, 30)]
                rows.append((1000 + i, " ".join(mutated)))
        df = spark.createDataFrame(rows, "id long, text string")
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(
                df, "id", "text", threshold=0.3, stop_shingle_df=None
            ).collect()
        }
        # brute-force oracle over k=3 shingle string sets
        sets = {}
        for i, t in rows:
            toks = t.split()
            sets[i] = {
                " ".join(toks[j:j + 3]) for j in range(len(toks) - 2)
            } if len(toks) >= 3 else set()
        want = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            if not sets[a] or not sets[b]:
                continue
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j >= 0.3:
                want[(a, b)] = round(j, 6)
        assert got == want

    def test_minhash_signature_batch_consistency(self, spark, docs):
        """Signatures must be identical regardless of batching/partition
        layout (content-derived hashing, no batch-local state)."""
        from sphinxsearchengine_spark.ops.dedup import minhash_signatures

        one = {r.id: r.sig for r in
               minhash_signatures(docs.coalesce(1), "id", "text").collect()}
        many = {r.id: r.sig for r in
                minhash_signatures(docs.repartition(4), "id", "text").collect()}
        assert one == many

    def test_stop_shingle_cap(self, spark):
        # a shingle present in every doc is dropped → no spurious pairs
        rows = [(i, f"common shingle text unique{i} word{i} tail{i}") for i in range(10)]
        df = spark.createDataFrame(rows, "id long, text string")
        out = ngram_jaccard_pairs(
            df, "id", "text", threshold=0.1, stop_shingle_df=5
        ).collect()
        assert out == []

    def test_hot_shingle_removal_is_broadcast_not_literal(self, spark):
        """The hot-shingle filter must stay executor-side: a broadcast of
        the hot set, never a driver-collected literal array (whose plan
        size would grow with the corpus)."""
        rows = [(i, f"common shingle text unique{i} word{i} tail{i}")
                for i in range(10)]
        df = spark.createDataFrame(rows, "id long, text string")
        out = ngram_jaccard_pairs(df, "id", "text", threshold=0.1,
                                  stop_shingle_df=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan
        # the dropped-hot-shingle hashes must NOT be inlined in the plan
        assert "array_except(shs, [" not in plan.replace("\n", "")

    def test_release_intermediates_leaves_no_cached_rdds(self, spark, docs):
        """The caching contract (VERDICT r4 #3): after materializing the
        pairs and calling release_intermediates, no persisted RDD from
        the dedup call may linger in executor storage — a pipeline
        looping dedup over many slices must not accumulate cache."""
        from sphinxsearchengine_spark.ops.dedup import release_intermediates

        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc.sc()
        for fn, kw in [
            (ngram_jaccard_pairs, {"threshold": 0.5}),
            (minhash_lsh_pairs, {"threshold": 0.5}),
            (simhash_pairs, {"max_hamming": 3, "n_docs": 6}),
        ]:
            out = fn(docs, "id", "text", **kw)
            out.collect()
            assert len(jsc.getRDDStorageInfo()) > 0  # cache was in use
            release_intermediates(out)
            assert len(jsc.getRDDStorageInfo()) == 0, fn.__name__

    def test_simhash_auto_with_n_docs_skips_count_job(self, spark, docs):
        """auto mode with a caller-provided n_docs must trigger ZERO jobs
        at plan time (the r3 version ran df.count() per call)."""
        sc = spark.sparkContext
        sc.setJobGroup("sh_ndocs", "simhash n_docs probe")
        try:
            simhash_pairs(docs, "id", "text", n_docs=123)  # lazy — no action
        finally:
            sc.setJobGroup(None, None)
        assert sc.statusTracker().getJobIdsForGroup("sh_ndocs") == []


class TestSimilarity:
    def test_exact_topk_orders_by_cosine(self, spark):
        rng = np.random.RandomState(7)
        vecs = rng.randn(50, 8).astype("float32")
        qv = vecs[0].tolist()
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "id long, vec array<float>",
        )
        got = cosine_topk(df, "id", "vec", qv, k=5, exclude_id=0).collect()
        # numpy oracle
        sims = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
        order = [i for i in np.argsort(-sims) if i != 0][:5]
        assert [r.id for r in got] == order

    def test_lsh_recall_vs_exact(self, spark):
        # clustered vectors (the realistic embedding regime for LSH):
        # 10 centers, small noise — true neighbors share sign buckets
        rng = np.random.RandomState(11)
        centers = rng.randn(10, 16) * 3
        vecs = (
            centers[rng.randint(0, 10, 200)] + rng.randn(200, 16) * 0.3
        ).astype("float32")
        qv = vecs[3].tolist()
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "id long, vec array<float>",
        )
        exact = {r.id for r in cosine_topk(df, "id", "vec", qv, 10, exclude_id=3).collect()}
        approx = {r.id for r in lsh_topk(df, "id", "vec", qv, 10, n_planes=8,
                                         probe_hamming=2, exclude_id=3).collect()}
        assert len(exact & approx) >= 5  # recall@10 >= 0.5 on random data

    def test_persisted_buckets_identical_and_pushed(self, spark, tmp_path):
        # the persisted-bucket serving path must (a) return exactly the
        # on-the-fly result and (b) push the bucket IN-filter into the
        # parquet scan (the 10^12-row story: probe buckets only)
        rng = np.random.RandomState(13)
        vecs = rng.randn(120, 16).astype("float32")
        qv = vecs[2].tolist()
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "id long, vec array<float>",
        )
        path = str(tmp_path / "emb_lsh")
        with_lsh_buckets(df, "vec", n_planes=8).write.parquet(path)
        stored = spark.read.parquet(path)
        fly = lsh_topk(df, "id", "vec", qv, 10, n_planes=8,
                       probe_hamming=2, exclude_id=2).collect()
        per = lsh_topk(stored, "id", "vec", qv, 10, n_planes=8,
                       probe_hamming=2, exclude_id=2,
                       bucket_col="lsh_bucket")
        assert [tuple(r) for r in per.collect()] == [tuple(r) for r in fly]
        plan = per._jdf.queryExecution().executedPlan().toString()
        pushed = plan.split("PushedFilters", 1)[1][:400]
        assert "lsh_bucket" in pushed and "In(" in pushed

    def test_pairs_probe_hamming_radius2_beats_radius1(self, spark):
        """probe_hamming=2 must actually probe 2-bit flips (ADVICE r4:
        the old code silently treated any radius as 1).  Buckets are
        assigned directly so the geometry is exact: identical vectors
        (cosine 1.0) whose buckets differ by 3 bits can only meet when
        each side probes out to radius 2 (1+1 < 3 <= 2+2)."""
        from sphinxsearchengine_spark.ops.similarity import (
            embedding_cosine_pairs,
        )

        v = [1.0, 0.0, 0.0, 0.0]
        rows = [(1, v, 0b0000), (2, v, 0b0111), (3, v, 0b0000)]
        df = spark.createDataFrame(
            rows, "id long, vec array<float>, bkt int"
        )
        r1 = {(r.id_a, r.id_b) for r in embedding_cosine_pairs(
            df, "id", "vec", 0.99, bucket_col="bkt", n_planes=4,
            probe_hamming=1).collect()}
        r2 = {(r.id_a, r.id_b) for r in embedding_cosine_pairs(
            df, "id", "vec", 0.99, bucket_col="bkt", n_planes=4,
            probe_hamming=2).collect()}
        assert (1, 3) in r1 and (1, 2) not in r1  # 3 bits apart: missed at r=1
        assert r2 == {(1, 2), (1, 3), (2, 3)}     # found at r=2
        with pytest.raises(ValueError):
            embedding_cosine_pairs(df, "id", "vec", 0.99, bucket_col="bkt",
                                   n_planes=4, probe_hamming=5)


class TestTextStats:
    def test_token_count_and_quality(self, spark, docs):
        tc = {r.id: r.n_tokens for r in token_count(docs, "id", "text").collect()}
        assert tc[1] == 13 and tc[6] == 0
        qs = {r.id: r for r in quality_score(docs, "id", "text").collect()}
        assert qs[1].quality == 1.0 and qs[6].quality == 0.0
        assert 0 < qs[1].stopword_ratio < 0.5

    def test_langid(self, spark, docs):
        pred = {r.id: r.pred_lang for r in lang_id(docs, "id", "text").collect()}
        assert pred[1] == "en" and pred[4] == "de" and pred[6] == "und"

    def test_fingerprint_stability(self, spark, docs):
        fp1 = {r.id: r.fp for r in fingerprint(docs, "id", "text").collect()}
        fp2 = {r.id: r.fp for r in fingerprint(docs, "id", "text").collect()}
        assert fp1 == fp2 and fp1[1] == fp1[2] != fp1[5]


class TestMultimodal:
    def test_feature_plumbing(self, spark):
        media = synth_media(spark, 30)
        feats = extract_features(media).collect()
        assert len(feats) == 30
        assert all(len(r.feature) == FEATURE_DIM for r in feats)
        # deterministic: same payload → same feature
        again = {r.media_id: r.feature for r in extract_features(media).collect()}
        for r in feats:
            assert again[r.media_id] == r.feature

    def test_frame_plan(self, spark):
        media = synth_media(spark, 30)
        plan = frame_sample_plan(media, every_ms=60000)
        rows = plan.groupBy("media_id").count().collect()
        vids = media.filter(F.col("kind") == "video").count()
        assert len(rows) == vids and all(r["count"] >= 1 for r in rows)

    def test_real_decoder_gate(self, spark):
        media = synth_media(spark, 5)
        with pytest.raises(NotImplementedError):
            extract_features(media, decode_stub=False)

    def test_header_decode_png_wav_jpeg(self):
        """Pure-struct header parsers against spec-valid container bytes
        (the PNG has correct CRCs + decompressible IDAT; the WAV is a
        complete PCM file)."""
        import zlib

        from sphinxsearchengine_spark.ops.multimodal import (
            decode_header, make_jpeg, make_png, make_wav,
        )

        png = make_png(320, 200)
        # sanity: the fixture really is a decodable PNG container —
        # IDAT data sits at [41, len-16) (sig 8 + IHDR 25 + IDAT len/tag
        # 8; trailing IDAT crc 4 + IEND 12) and must inflate to
        # height*(1 filter byte + 3*width) bytes of scanlines
        assert len(zlib.decompress(png[41:-16])) == 200 * (1 + 3 * 320)
        assert decode_header(png) == ("png", 320, 200, 3, None)
        assert decode_header(make_wav(44100, 2, 100)) == (
            "wav", None, None, 2, 44100)
        assert decode_header(make_jpeg(1024, 768, 3)) == (
            "jpeg", 1024, 768, 3, None)
        assert decode_header(b"\x00garbage") == (None,) * 5

    def test_header_decode_malformed_never_raises(self):
        """One bad blob inside a mapInPandas batch must not kill the
        task: truncated/corrupt payloads degrade to (fmt, None, ...)."""
        from sphinxsearchengine_spark.ops.multimodal import (
            decode_header, make_jpeg, make_png, make_wav,
        )

        png, jpg, wav = make_png(32, 16), make_jpeg(64, 48, 3), make_wav(8000, 1, 4)
        for payload in (png, jpg, wav):
            for cut in range(len(payload)):
                res = decode_header(payload[:cut])  # must not raise
                assert len(res) == 5
        # truncated mid-IHDR: magic recognized, fields degrade to None
        assert decode_header(png[:20]) == ("png", None, None, None, None)

    def test_jpeg_fill_bytes_and_rst_markers(self):
        """ITU T.81 B.1.1.2 allows 0xFF fill bytes before any marker and
        length-less TEM/RSTn markers; the SOF scan must step over both."""
        import struct as st

        from sphinxsearchengine_spark.ops.multimodal import decode_header

        sof0 = b"\x08" + st.pack(">HH", 48, 64) + b"\x03" \
            + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        jpg = (
            b"\xff\xd8"
            + b"\xff\x01"                       # TEM: no length segment
            + b"\xff\xd0"                       # RST0: no length segment
            + b"\xff\xe0" + st.pack(">H", 4) + b"ab"   # APP0 segment
            + b"\xff\xff\xff\xc0"               # fill bytes then SOF0
            + st.pack(">H", len(sof0) + 2) + sof0
            + b"\xff\xd9"
        )
        assert decode_header(jpg) == ("jpeg", 64, 48, 3, None)

    def test_header_decode_distributed(self, spark):
        from sphinxsearchengine_spark.ops.multimodal import (
            decode_media_headers, make_png, make_wav,
        )

        rows = [(i, make_png(10 + i, 20 + i)) for i in range(5)] + [
            (100 + i, make_wav(8000 * (i + 1), 1, 10)) for i in range(3)
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {r.media_id: r for r in
               decode_media_headers(df.repartition(3)).collect()}
        assert got[2].fmt == "png" and (got[2].width, got[2].height) == (12, 22)
        assert got[101].fmt == "wav" and got[101].sample_rate == 16000
        assert len(got) == 8


class TestDuckDBHashParity:
    """Tripwires for the SQL-oracle contract: the dedup token hash and
    the corpus docid/date derivation must stay bit-identical to what
    DuckDB can recompute (md5_number_lower / hex-substr parsing), or the
    driver's value-checked gate entries silently rot."""

    def test_token_hash_is_md5_number_lower(self):
        import duckdb

        from sphinxsearchengine_spark.ops.dedup import _token_hashes

        toks = ["spark", "join", "0", "ünïcode", "x" * 100]
        got = _token_hashes(toks)
        con = duckdb.connect()
        for t, h in zip(toks, got):
            (want,) = con.execute("select md5_number_lower(?)", [t]).fetchone()
            assert int(h) == int(want), t

    def test_md5_i64_matches_duckdb_hex_parse(self, spark):
        import duckdb

        from pyspark.sql import functions as F

        from sphinxsearchengine_spark.corpus import _md5_i64

        keys = ["a\x1fb\x1fc", "doc/0", ""]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        rows = df.select(
            "k",
            _md5_i64(F.col("k"), lo=True).alias("lo"),
            _md5_i64(F.col("k"), lo=False).alias("hi"),
        ).collect()
        con = duckdb.connect()

        def s64(u):
            return u - (1 << 64) if u >= (1 << 63) else u

        for r in rows:
            lo, hi = con.execute(
                "select CAST(('0x'||substr(md5(?),17,16))::UBIGINT AS HUGEINT),"
                "       CAST(('0x'||substr(md5(?),1,16))::UBIGINT AS HUGEINT)",
                [r.k, r.k],
            ).fetchone()
            assert r.lo == s64(int(lo)) and r.hi == s64(int(hi)), r.k


class TestIVF:
    def test_ivf_matches_bruteforce_within_probed_cells(self, spark):
        from sphinxsearchengine_spark.ops.similarity import (
            cosine_topk, ivf_centroids, ivf_topk, with_ivf_cells,
        )

        rng = np.random.RandomState(5)
        vecs = rng.randn(120, 12).astype("float32")
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "id long, vec array<float>",
        )
        cents = ivf_centroids(df, "id", "vec", k=6)
        celled = with_ivf_cells(df, "vec", cents)
        qv = vecs[3].tolist()
        got = ivf_topk(celled, "id", "vec", qv, cents, k=5, nprobe=2,
                       exclude_id=3).collect()
        # oracle: recompute cells + probes in numpy, brute-force inside
        vnorm = vecs.astype(np.float64)
        cell = np.argmax(vnorm @ cents.T, axis=1)
        probes = set(np.argsort(-(cents @ np.asarray(qv)))[:2])
        keep = [i for i in range(120) if cell[i] in probes and i != 3]
        sims = {i: float(vnorm[i] @ np.asarray(qv)
                         / (np.linalg.norm(vnorm[i]) * np.linalg.norm(qv)))
                for i in keep}
        order = sorted(keep, key=lambda i: (-sims[i], i))[:5]
        assert [r.id for r in got] == order

    def test_ivf_nprobe_all_equals_exact(self, spark):
        from sphinxsearchengine_spark.ops.similarity import (
            cosine_topk, ivf_centroids, ivf_topk, with_ivf_cells,
        )

        rng = np.random.RandomState(9)
        vecs = rng.randn(60, 8).astype("float32")
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "id long, vec array<float>",
        )
        cents = ivf_centroids(df, "id", "vec", k=4)
        celled = with_ivf_cells(df, "vec", cents)
        qv = vecs[0].tolist()
        approx = ivf_topk(celled, "id", "vec", qv, cents, k=5, nprobe=4,
                          exclude_id=0).collect()
        exact = cosine_topk(df, "id", "vec", qv, k=5, exclude_id=0).collect()
        assert [r.id for r in approx] == [r.id for r in exact]

    def test_ivf_kmeans_recall_vs_bruteforce(self, spark):
        """IVF credibility at scale (VERDICT r3 #6): on a 1k-vector
        clustered fixture, KMeans-trained cells with nprobe=3/8 must
        reach recall@10 >= 0.9 against brute force, and must beat-or-tie
        what a degenerate single-probe scan of random cells would give
        (sanity that the trainer actually clusters)."""
        from sphinxsearchengine_spark.ops.similarity import (
            cosine_topk, ivf_centroids_kmeans, ivf_topk, with_ivf_cells,
        )

        rng = np.random.RandomState(7)
        # 8 well-separated cluster centers, 125 points each, dim 16
        centers = rng.randn(8, 16) * 4
        vecs = np.concatenate(
            [c + rng.randn(125, 16) for c in centers]
        ).astype("float32")
        # shuffle ids deterministically so the smallest-id training
        # sample is cluster-mixed (the realistic case)
        perm = rng.permutation(len(vecs))
        vecs = vecs[perm]
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "id long, vec array<float>",
        )
        cents = ivf_centroids_kmeans(df, "id", "vec", k=8, iters=10,
                                     sample_rows=400)
        celled = with_ivf_cells(df, "vec", cents).cache()
        recalls = []
        for qid in [1, 57, 333, 700, 901]:
            qv = vecs[qid].tolist()
            exact = {r.id for r in
                     cosine_topk(df, "id", "vec", qv, k=10,
                                 exclude_id=qid).collect()}
            got = {r.id for r in
                   ivf_topk(celled, "id", "vec", qv, cents, k=10, nprobe=3,
                            exclude_id=qid).collect()}
            recalls.append(len(got & exact) / 10.0)
        assert sum(recalls) / len(recalls) >= 0.9, recalls

    def test_ivf_kmeans_tablesample_variant(self, spark):
        """sample_fraction switches training to a seeded Bernoulli
        sample (for non-uniform id spaces); centroids must still be
        unit-norm, deterministic across calls, and serve the same
        ivf_topk path."""
        from sphinxsearchengine_spark.ops.similarity import (
            ivf_centroids_kmeans, ivf_topk, with_ivf_cells,
        )

        rng = np.random.RandomState(3)
        vecs = rng.randn(300, 8).astype("float32")
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "id long, vec array<float>",
        )
        c1 = ivf_centroids_kmeans(df, "id", "vec", k=4, iters=5,
                                  sample_rows=200, sample_fraction=0.7)
        c2 = ivf_centroids_kmeans(df, "id", "vec", k=4, iters=5,
                                  sample_rows=200, sample_fraction=0.7)
        assert np.allclose(c1, c2)
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
        celled = with_ivf_cells(df, "vec", c1)
        got = ivf_topk(celled, "id", "vec", vecs[5].tolist(), c1, k=5,
                       nprobe=4, exclude_id=5).collect()
        assert len(got) == 5

    def test_embedding_cosine_pairs_exact_vs_numpy(self, spark):
        """Exact mode must equal the numpy all-pairs oracle."""
        from sphinxsearchengine_spark.ops.similarity import (
            embedding_cosine_pairs,
        )

        rng = np.random.RandomState(11)
        vecs = rng.randn(80, 12).astype("float32")
        # plant near-dups
        for i, j in [(0, 40), (5, 41), (9, 42)]:
            vecs[j] = vecs[i] + 0.05 * rng.randn(12).astype("float32")
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "id long, vec array<float>",
        )
        got = {(r.id_a, r.id_b) for r in
               embedding_cosine_pairs(df, "id", "vec", threshold=0.8).collect()}
        v = vecs.astype(np.float64)
        n = v / np.linalg.norm(v, axis=1, keepdims=True)
        sims = n @ n.T
        want = {(i, j) for i in range(80) for j in range(i + 1, 80)
                if sims[i, j] >= 0.8}
        assert got == want
        assert {(0, 40), (5, 41), (9, 42)} <= got

    def test_embedding_cosine_pairs_lsh_blocked_recall(self, spark):
        """LSH-blocked mode: precision 1 (exact verify) and recall >= 0.9
        on the planted near-dups — the 10^12-row path never does the
        O(n^2) join."""
        from sphinxsearchengine_spark.ops.similarity import (
            embedding_cosine_pairs, with_lsh_buckets,
        )

        rng = np.random.RandomState(13)
        vecs = rng.randn(200, 16).astype("float32")
        for i in range(0, 60, 2):
            vecs[i + 1] = vecs[i] + 0.04 * rng.randn(16).astype("float32")
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "id long, vec array<float>",
        )
        exact = {(r.id_a, r.id_b) for r in
                 embedding_cosine_pairs(df, "id", "vec",
                                        threshold=0.9).collect()}
        bucketed = with_lsh_buckets(df, "vec", n_planes=8)
        blocked = {(r.id_a, r.id_b) for r in
                   embedding_cosine_pairs(
                       bucketed, "id", "vec", threshold=0.9,
                       bucket_col="lsh_bucket", n_planes=8,
                   ).collect()}
        assert blocked <= exact            # precision 1
        assert len(exact) > 0
        assert len(blocked & exact) / len(exact) >= 0.9, (
            len(blocked), len(exact))


class TestDuplicateGroups:
    """Connected-component resolution of pair output (large-star /
    small-star) — transitive closure semantics the pair ops don't give."""

    def _pairs(self, spark, edges):
        return spark.createDataFrame(
            [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
        )

    def test_transitive_chain(self, spark):
        from sphinxsearchengine_spark.ops.dedup import duplicate_groups

        # 1-2-3-4 is one component even though (1,4) was never a pair
        got = {
            (r.id, r.group_id)
            for r in duplicate_groups(
                self._pairs(spark, [(2, 1), (2, 3), (3, 4), (9, 10)])
            ).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (9, 9), (10, 9)}

    def test_matches_union_find_on_random_graph(self, spark):
        from sphinxsearchengine_spark.ops.dedup import duplicate_groups

        rng = np.random.RandomState(7)
        edges = {tuple(sorted(p)) for p in rng.randint(0, 60, (80, 2)) if p[0] != p[1]}
        # reference: plain union-find
        parent = list(range(61))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        want = {}
        for a, b in edges:
            for n in (a, b):
                want[n] = None
        for n in want:
            root = find(n)
            want[n] = min(m for m in want if find(m) == root)
        got = {
            r.id: r.group_id
            for r in duplicate_groups(self._pairs(spark, sorted(edges))).collect()
        }
        assert got == want

    def test_singletons_and_keep_canonical(self, spark, docs):
        from sphinxsearchengine_spark.ops.dedup import (
            duplicate_groups,
            keep_canonical,
        )

        pairs = self._pairs(spark, [(1, 2), (2, 3)])
        groups = duplicate_groups(
            pairs, all_ids=docs.select("id")
        )
        got = {r.id: r.group_id for r in groups.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6}
        kept = sorted(
            r.id for r in keep_canonical(docs, "id", groups).collect()
        )
        assert kept == [1, 4, 5, 6]

    def test_empty_pairs(self, spark):
        from sphinxsearchengine_spark.ops.dedup import duplicate_groups

        empty = spark.createDataFrame([], "id_a long, id_b long")
        assert duplicate_groups(empty).count() == 0


class TestSampling:
    """Deterministic hash sampling: JVM expr == Python hash == DuckDB
    md5_number_lower, and the behavioral contracts (stability,
    partition-independence, per-stratum rates)."""

    def test_md5_low64_col_parity(self, spark):
        import duckdb

        from sphinxsearchengine_spark.hashing import md5_low64_many
        from sphinxsearchengine_spark.ops.sampling import md5_low64_col

        keys = ["", "a", "42:s42", "-7:split", "привет", "x" * 100]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        got = [
            int(r.h) for r in
            df.select(md5_low64_col(F.col("k")).alias("h")).collect()
        ]
        assert got == [int(x) for x in md5_low64_many(keys)]
        duck = [
            duckdb.sql(f"SELECT md5_number_lower('{k}')").fetchone()[0]
            for k in keys
        ]
        assert got == [int(x) for x in duck]

    def test_hash_sample_deterministic_and_partition_independent(self, spark):
        from sphinxsearchengine_spark.ops.sampling import hash_sample

        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        a = {r.doc_id for r in hash_sample(df, "doc_id", 0.2).collect()}
        b = {
            r.doc_id
            for r in hash_sample(df.repartition(7), "doc_id", 0.2).collect()
        }
        assert a == b and 300 < len(a) < 500  # ~400 expected
        # monotone: a smaller fraction yields a SUBSET (same salt)
        c = {r.doc_id for r in hash_sample(df, "doc_id", 0.05).collect()}
        assert c <= a
        # different salt decorrelates
        d = {r.doc_id for r in hash_sample(df, "doc_id", 0.2, salt="x").collect()}
        assert d != a

    def test_stratified_rates(self, spark):
        from sphinxsearchengine_spark.ops.sampling import stratified_sample

        rows = [(i, "en" if i % 2 else "rust") for i in range(4000)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        got = stratified_sample(
            df, "doc_id", "lang", {"rust": 1.0, "en": 0.1}
        ).groupBy("lang").count().collect()
        counts = {r.lang: r["count"] for r in got}
        assert counts["rust"] == 2000
        assert 120 < counts["en"] < 280  # ~200
        # unlisted strata fall to default=0
        df2 = spark.createDataFrame([(1, "de")], "doc_id long, lang string")
        assert stratified_sample(
            df2, "doc_id", "lang", {"en": 1.0}
        ).count() == 0

    def test_train_test_split_stable_under_growth(self, spark):
        from sphinxsearchengine_spark.ops.sampling import train_test_split

        small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
        s = {r.doc_id: r.split
             for r in train_test_split(small, "doc_id", 0.25).collect()}
        b = {r.doc_id: r.split
             for r in train_test_split(big, "doc_id", 0.25).collect()}
        assert all(b[k] == v for k, v in s.items())  # growth keeps sides
        n_test = sum(1 for v in b.values() if v == "test")
        assert 180 < n_test < 320  # ~250


class TestRepetitionStats:
    """Gopher-style repetition signals (textstats.ngram_repetition /
    line_repetition) — hand-computed fixtures."""

    def test_ngram_repetition_hand_values(self, spark):
        from sphinxsearchengine_spark.ops.textstats import ngram_repetition

        df = spark.createDataFrame(
            [(1, "a b a b a b c"), (2, "x y z"), (3, ""), (4, "q")],
            "id long, text string",
        )
        got = {r.id: r for r in ngram_repetition(df, "id", "text").collect()}
        # doc 1 2-grams: ab ba ab ba ab bc -> top 3/6, dup (3+2)/6
        assert got[1].n_tokens == 7
        assert got[1].top_2gram_frac == 0.5
        assert got[1].dup_2gram_frac == round(5 / 6, 6)
        # doc 1 3-grams: aba bab aba bab abc -> top 2/5, dup 4/5
        assert got[1].top_3gram_frac == 0.4
        assert got[1].dup_3gram_frac == 0.8
        # no repeats: top = 1/n_grams, dup = 0
        assert got[2].top_2gram_frac == 0.5 and got[2].dup_2gram_frac == 0.0
        # degenerate docs -> all zeros, rows still present
        for i in (3, 4):
            assert got[i].top_2gram_frac == 0.0
            assert got[i].dup_3gram_frac == 0.0

    def test_line_repetition_hand_values(self, spark):
        from sphinxsearchengine_spark.ops.textstats import line_repetition

        df = spark.createDataFrame(
            [(1, "foo\nbar\nfoo\n baz \nbar\nfoo"), (2, "only\nlines"),
             (3, "\n \n")],
            "id long, text string",
        )
        got = {r.id: r for r in line_repetition(df, "id", "text").collect()}
        # foo x3 + bar x2 duplicated of 6 lines; baz trims to 3 chars
        assert got[1].n_lines == 6
        assert got[1].dup_line_frac == round(5 / 6, 6)
        assert got[1].dup_line_char_frac == round(15 / 18, 6)
        assert got[2] == (2, 2, 0.0, 0.0)
        assert got[3] == (3, 0, 0.0, 0.0)  # whitespace-only -> no lines

    def test_ngram_repetition_plan_is_narrow(self, spark):
        # zero-shuffle contract: no Exchange; exactly ONE vectorized
        # counting pass (the r6 mapInPandas rewrite — guide §4.2) feeds
        # the JVM fraction arithmetic
        from sphinxsearchengine_spark.ops.textstats import ngram_repetition

        df = spark.createDataFrame([(1, "a b c")], "id long, text string")
        plan = ngram_repetition(df, "id", "text")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
        assert plan.count("MapInPandas") == 1

    def test_ngram_repetition_null_text_zero_row(self, spark):
        # NULL text must produce the 0/0.0 row the DuckDB oracle's
        # LEFT JOIN + coalesce emits (ADVICE r5)
        from sphinxsearchengine_spark.ops.textstats import ngram_repetition

        df = spark.createDataFrame([(1, None)], "id long, text string")
        (row,) = ngram_repetition(df, "id", "text").collect()
        assert tuple(row) == (1, 0, 0.0, 0.0, 0.0, 0.0)


class TestDecontaminate:
    def test_hand_values_and_full_row_coverage(self, spark):
        from sphinxsearchengine_spark.ops.decontam import decontaminate

        docs = spark.createDataFrame(
            [(1, "a b a b a b c"), (2, "x y z"), (3, ""), (4, "q")],
            "id long, text string",
        )
        bench = spark.createDataFrame([(100, "a b a")], "id long, text string")
        got = {r.id: r for r in
               decontaminate(docs, bench, "id", "text", n=2).collect()}
        assert len(got) == 4  # every doc row survives, even gram-less
        # doc 1 distinct 2-grams {ab, ba, bc}; bench grams {ab, ba}
        assert got[1] == (1, 3, 2, round(2 / 3, 6), 1)
        assert got[2].contaminated == 0 and got[2].n_hits == 0
        assert got[3] == (3, 0, 0, 0.0, 0)
        assert got[4] == (4, 0, 0, 0.0, 0)

    def test_empty_bench_flags_nothing(self, spark):
        from sphinxsearchengine_spark.ops.decontam import decontaminate

        docs = spark.createDataFrame([(1, "a b c")], "id long, text string")
        bench = docs.filter("id < 0")
        rows = decontaminate(docs, bench, "id", "text", n=2).collect()
        assert [(r.n_hits, r.contaminated) for r in rows] == [(0, 0)]

    def test_corpus_side_is_one_narrow_pass(self, spark):
        # scale contract (r6): the corpus side is ONE vectorized probe
        # pass against the broadcast bench-gram set — no explode, no
        # join, no shuffle anywhere in the corpus-side plan (the r5
        # explode + broadcast-hash join + groupBy shape cost 47.8 s vs
        # 4.2 s at sf1.0 for identical output)
        from sphinxsearchengine_spark.ops.decontam import decontaminate

        docs = spark.createDataFrame([(1, "a b c")], "id long, text string")
        plan = decontaminate(docs, docs, "id", "text", n=2)._jdf \
            .queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan
        assert plan.count("MapInPandas") == 1


class TestScrubPii:
    def test_redaction_and_counts(self, spark):
        from sphinxsearchengine_spark.ops.scrub import scrub_pii

        df = spark.createDataFrame(
            [(1, "mail bob@example.com see https://x.io/a?u=1"),
             (2, "hosts 10.0.0.1 192.168.1.255; ftp://not-a-match"),
             (3, "https://u:p@h.com/p and carol.smith+x@sub.domain.org"),
             (4, "clean")],
            "id long, text string",
        )
        got = {r.id: r for r in scrub_pii(df, "id", "text").collect()}
        assert got[1].text == "mail <EMAIL> see <URL>"
        assert (got[1].n_urls, got[1].n_emails, got[1].n_ipv4s) == (1, 1, 0)
        assert got[2].text == "hosts <IP> <IP>; ftp://not-a-match"
        assert got[2].n_ipv4s == 2
        # URL redacted FIRST: the email-shaped userinfo belongs to the
        # URL and must not be double-counted as an email
        assert got[3].text == "<URL> and <EMAIL>"
        assert (got[3].n_urls, got[3].n_emails) == (1, 1)
        assert got[4].text == "clean"

    def test_plan_is_narrow(self, spark):
        from sphinxsearchengine_spark.ops.scrub import scrub_pii

        df = spark.createDataFrame([(1, "x")], "id long, text string")
        plan = scrub_pii(df, "id", "text")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan


class TestCuratePipeline:
    def test_each_stage_filters(self, spark):
        from sphinxsearchengine_spark.ops.pipeline import curate

        base = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lambda")
        rows = [
            (1, base + " one", "en"),        # survives everything
            (2, "too short", "en"),          # fails quality (n<10)
            (3, base + " one", "en"),        # exact dup of 1 -> dropped
            (4, base + " contaminated benchmark overlap words", "en"),
            (5, base + " two", "de"),        # survives (de quota 1.0)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        bench = spark.createDataFrame(
            [(100, "contaminated benchmark overlap")],
            "doc_id long, text string",
        )
        out = curate(
            docs, "doc_id", "text", "lang", {"en": 1.0, "de": 1.0},
            bench=bench, decontam_n=3, test_fraction=0.5,
        )
        got = {r.doc_id: r.split for r in out.collect()}
        assert set(got) == {1, 5}
        # split values are the stable content-hash sides
        from sphinxsearchengine_spark.ops.sampling import train_test_split
        expect = {
            r.doc_id: r.split
            for r in train_test_split(
                docs.filter("doc_id in (1,5)"), "doc_id", 0.5
            ).collect()
        }
        assert got == expect

    def test_no_bench_skips_decontam(self, spark):
        from sphinxsearchengine_spark.ops.pipeline import curate

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = spark.createDataFrame(
            [(1, base, "en")], "doc_id long, text string, lang string"
        )
        assert curate(
            docs, "doc_id", "text", "lang", {"en": 1.0}
        ).count() == 1

    def test_keeper_stage_has_partial_aggregation(self, spark):
        # skew contract (VERDICT r5 #3): the exact-dedup keeper is a
        # groupBy(digest).agg(min(id)) — a PARTIAL HashAggregate must
        # sit below the exchange so every partition's copies of a viral
        # duplicate collapse map-side (the r5 row_number() window sent
        # all copies of one digest to a single reducer, no partial agg)
        from sphinxsearchengine_spark.ops.pipeline import _keeper_ids

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa",
              "en")],
            "doc_id long, text string, lang string",
        )
        plan = _keeper_ids(docs, "doc_id", "text")._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Exchange") == 1
        # partial agg below the exchange, final above it
        pre_exchange = plan.split("Exchange")[-1]
        assert "HashAggregate" in pre_exchange
        assert "Window" not in plan and "row_number" not in plan


class TestTokenCountBpe:
    def test_hand_counts(self, spark):
        from sphinxsearchengine_spark.ops.textstats import token_count_bpe

        df = spark.createDataFrame(
            [
                (1, "def f(x): return x+1"),
                # def | f | ( | x | ): | return | x | + | 1 -> 9
                (2, "hello world"),          # 2
                (3, "v1.2.3"),               # v |1| . |2| . |3 -> 6
                (4, ""),                     # 0
            ],
            "id long, text string",
        )
        got = {r.id: r.n_pieces for r in token_count_bpe(df, "id", "text").collect()}
        assert got == {1: 9, 2: 2, 3: 6, 4: 0}


class TestPackSequences:
    def test_next_fit_semantics_single_stream(self, spark):
        from sphinxsearchengine_spark.ops.packing import pack_sequences

        # n_parts=1 -> one deterministic stream ordered by id
        rows = [
            (1, "a " * 6),    # 6 tokens -> bin 0 (fill 6)
            (2, "b " * 3),    # 6+3 <= 10 -> bin 0 (fill 9)
            (3, "c " * 2),    # 9+2 > 10 -> bin 1 (fill 2)
            (4, "d " * 15),   # 2+15 > 10 -> bin 2 (oversized, alone)
            (5, "e " * 1),    # 15+1 > 10 -> bin 3
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.id: (r.bin_id, r.n_tokens)
            for r in pack_sequences(df, "doc_id", "text", budget=10,
                                    n_parts=1).collect()
        }
        assert got == {1: (0, 6), 2: (0, 3), 3: (1, 2), 4: (2, 15),
                       5: (3, 1)}

    def test_deterministic_across_partitioning_and_budget_respected(
        self, spark
    ):
        from sphinxsearchengine_spark.ops.packing import pack_sequences

        rows = [(i, "tok " * (i % 37 + 1)) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = {(r.id, r.part, r.bin_id)
             for r in pack_sequences(df, "doc_id", "text", 64).collect()}
        b = {(r.id, r.part, r.bin_id)
             for r in pack_sequences(df.repartition(13), "doc_id", "text",
                                     64).collect()}
        assert a == b  # content-hash streams, not Spark partitioning
        # every multi-doc bin respects the budget
        out = pack_sequences(df, "doc_id", "text", 64)
        bad = (
            out.groupBy("part", "bin_id")
            .agg(F.sum("n_tokens").alias("s"), F.count("*").alias("c"))
            .filter("s > 64 AND c > 1")
            .count()
        )
        assert bad == 0
