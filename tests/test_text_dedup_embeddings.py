"""Training-data operators: text analysis, near-dup dedup, similarity search."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from aws_medallion_datalake_ray.functions.dedup import (
    hamming64,
    jaccard,
    minhash_near_dups,
    ngram_jaccard,
    simhash64,
)
from aws_medallion_datalake_ray.functions.embeddings import ann_lsh, cosine_topk
from aws_medallion_datalake_ray.functions.text import TextAnalyzer, token_count


def test_token_count():
    s = pd.Series(["a b  c", "", None, "single"])
    assert list(token_count(s)) == [3, 0, 0, 1]


def test_langid_heuristic():
    an = TextAnalyzer()
    s = pd.Series(
        [
            "the cat and the dog sat in the house for a while",
            "der Hund und die Katze sind nicht in das Haus",
            "le chat et le chien sont dans la maison pour un moment",
            "el gato y el perro es una casa para los dos",
            "这是一个中文句子用于测试语言识别功能",
        ]
    )
    assert list(an.lang_scores(s)) == ["en", "de", "fr", "es", "zh"]


def test_quality_score_orders_sensibly():
    an = TextAnalyzer()
    good = "the quick brown fox jumps over the lazy dog and runs to the house in a field"
    bad = "@@@ ### !!! ;;; ::: %%% ^^^ &&& *** ((( )))"
    q = an.quality(pd.Series([good, bad]))
    assert q["quality_score"][0] > q["quality_score"][1]


def test_fingerprint_whitespace_robust():
    an = TextAnalyzer()
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "alpha  beta gamma\tdelta epsilon zeta eta theta iota kappa"
    c = "totally different words here that share nothing at all with it"
    f = an.fingerprint(pd.Series([a, b, c]))
    assert f[0] == f[1] != f[2]


def test_jaccard_and_ngram():
    a = "one two three four five six seven eight nine ten"
    b = "one two three four five six seven eight nine eleven"
    assert 0.5 < jaccard(a, b) < 1.0
    assert jaccard(a, a) == 1.0
    assert ngram_jaccard("abcdef", "abcdef") == 1.0
    assert ngram_jaccard("abcdef", "zzzzzz") == 0.0


def test_simhash_near_vs_far():
    s = pd.Series(
        [
            "the quick brown fox jumps over the lazy dog near the river bank",
            "the quick brown fox jumps over the lazy dog near the river bend",
            "completely unrelated legal boilerplate about contracts and parties",
        ]
    )
    h = simhash64(s)
    d_near = hamming64(h[:1], h[1:2])[0]
    d_far = hamming64(h[:1], h[2:3])[0]
    assert d_near < d_far


def test_minhash_lsh_finds_planted_pair():
    base = [
        f"document number {i} talks about topic {i % 7} with words "
        + " ".join(f"w{i}{j}" for j in range(30))
        for i in range(40)
    ]
    near = base[0] + " tiny edit"
    t = pa.table({"doc_id": list(range(40)) + [100], "text": base + [near]})
    pairs = minhash_near_dups(ray.data.from_arrow(t), threshold=0.6)
    got = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    assert (0, 100) in got
    # no false positives among unrelated docs
    assert all(b == 100 and a == 0 for a, b in got)


def test_cosine_topk_matches_numpy():
    rng = np.random.default_rng(0)
    m = rng.standard_normal((200, 16)).astype(np.float32)
    q = m[3]
    t = pa.table(
        {"vec_id": pa.array(range(200), pa.int64()),
         "embedding": pa.array([row.tolist() for row in m], pa.list_(pa.float32()))}
    )
    got = cosine_topk(ray.data.from_arrow(t), q, k=5)
    sims = (m.astype(np.float64) @ q.astype(np.float64)) / (
        np.linalg.norm(m.astype(np.float64), axis=1) * np.linalg.norm(q.astype(np.float64))
    )
    exp = np.argsort(-np.round(sims, 6), kind="stable")[:5]
    assert got["vec_id"].tolist() == exp.tolist()
    assert got["rank"].tolist() == [1, 2, 3, 4, 5]
    assert got["vec_id"].iloc[0] == 3  # self first


def test_ann_lsh_self_hit():
    rng = np.random.default_rng(1)
    m = rng.standard_normal((100, 8)).astype(np.float32)
    t = pa.table(
        {"vec_id": pa.array(range(100), pa.int64()),
         "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32()))}
    )
    out = ann_lsh(ray.data.from_arrow(t), m[7], dim=8, k=3, n_planes=4, n_probe_bits=1)
    assert out["vec_id"].iloc[0] == 7  # query's own bucket contains it


def test_ann_ivf_recall_and_bounded_probe(ray_session):
    """IVF with clustered data: a query from a cluster must recover its own
    cluster's members at full recall while scanning only nprobe clusters."""
    from aws_medallion_datalake_ray.functions.embeddings import (
        ann_ivf, assign_ivf, build_ivf_centroids, cosine_topk)

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 16)) * 4
    pts = np.vstack([c + rng.standard_normal((40, 16)) * 0.2 for c in centers])
    t = pa.table(
        {"vec_id": pa.array(range(len(pts)), pa.int64()),
         "embedding": pa.array([r.tolist() for r in pts], pa.list_(pa.float32()))}
    )
    ds = ray.data.from_arrow(t)
    cent = build_ivf_centroids(ds, n_centroids=8, sample_size=320, seed=5)
    q = pts[7]
    exact = cosine_topk(ds, q, k=10)
    approx = ann_ivf(ds, q, cent, nprobe=2, k=10)
    assert set(approx["vec_id"]) == set(exact["vec_id"])
    assert approx["vec_id"].iloc[0] == 7  # self hit first
    # probe scan is bounded: 2 of 8 clusters
    sizes = assign_ivf(ds, cent).groupby("ivf_cluster").count().to_pandas()
    assert len(sizes) == 8


def test_analyze_arrow_matches_legacy_python_re():
    """The fused RE2/Arrow pass must reproduce lang_scores + quality +
    fingerprint exactly on natural multilingual text (the RE2 \\b caveat only
    bites on stopwords abutting accented letters)."""
    import pyarrow as pa

    an = TextAnalyzer(text_col="text")
    texts = pd.Series(
        [
            "the cat is in the house and it is warm for the winter " * 3,
            "die katze ist in dem haus und es ist warm für den winter",
            "le chat est dans la maison et il est chaud pour un hiver",
            "el gato es en la casa y es un calor para el invierno",
            "def f(x):\n    return x + 1  # code-ish, punctuation heavy!!!",
            "自然语言处理是人工智能的一个重要领域。我们喜欢研究它!很好。",
            "Это естественный русский текст, с запятыми и точками.",
            "Ελληνικά κείμενα έχουν τόνους, σωστά; Ναι.",
            "",
            "   ",
            "short doc",
            None,
        ]
    )
    langs_old = an.lang_scores(texts.fillna(""))
    q_old = an.quality(texts.fillna(""), langs=langs_old)
    fp_old = an.fingerprint(texts.fillna(""))
    fused = an.analyze(texts)
    assert (fused["lang_pred"].to_numpy() == langs_old.to_numpy()).all()
    for c in q_old.columns:
        assert np.array_equal(fused[c].to_numpy(), q_old[c].to_numpy()), c
    assert (fused["fingerprint"].to_numpy() == fp_old.to_numpy()).all()
    # arrow batch entry point produces the same columns
    from aws_medallion_datalake_ray.functions.text import analyze_batch_arrow

    t = pa.table({"text": pa.array(texts.fillna(""), pa.large_string())})
    out = analyze_batch_arrow(t, "text")
    assert out["quality_score"].to_pylist() == fused["quality_score"].tolist()


def test_fingerprint_arrow_tricky_cases():
    """Short docs (padding), blank docs, edge whitespace, unicode — the
    Arrow split path must agree with Python str.split() byte-for-byte."""
    import pyarrow as pa
    import pyarrow.compute as pc

    an = TextAnalyzer()
    tricky = pd.Series(
        [
            "", "   ", "one", "a b c",
            "one two three four five six seven",
            "a b c d e f g h", "a b c d e f g h i j k",
            "  leading and trailing   ws  ",
            "tab\tand\nnewline mixed   spaces x y z q w",
            "ünïcödé tökens ärê fine herë ok yes sure thing",
        ]
    )
    old = an.fingerprint(tricky)
    new = an.fingerprint_arrow(pc.fill_null(pa.array(tricky, pa.large_string()), ""))
    assert list(old) == list(new)


def test_quality_per_language_stopwords():
    """de/fr/es natural text must score comparably to its English translation
    (the stopword ratio follows the predicted language, not hardcoded en)."""
    an = TextAnalyzer()
    texts = pd.Series(
        {
            "en": "the cat is in the house and it is warm for the winter",
            "de": "die katze ist in dem haus und es ist warm für den winter",
            "fr": "le chat est dans la maison et il est chaud pour un hiver",
            "es": "el gato es en la casa y es un calor para el invierno",
        }
    )
    langs = an.lang_scores(texts)
    assert langs.tolist() == ["en", "de", "fr", "es"]
    q = an.quality(texts, langs=langs)
    ratios = q["stopword_ratio"]
    # every language's stopword ratio lands in the natural-text band
    assert (ratios > 0.15).all(), ratios.tolist()
    en_score = q["quality_score"]["en"]
    for lang in ["de", "fr", "es"]:
        assert abs(q["quality_score"][lang] - en_score) < 0.15, (lang, q["quality_score"])


def test_embedding_near_dup_mega_bucket_bounded(ray_session):
    """An all-similar corpus (every vector in one LSH bucket) must complete
    with windowed bounded work and still find the near-identical pairs."""
    import pyarrow as pa

    from aws_medallion_datalake_ray.functions.embeddings import embedding_near_dups

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    n = 400
    vecs = base + rng.standard_normal((n, 16)) * 1e-4  # all nearly identical
    t = pa.table(
        {"vec_id": pa.array(range(n), pa.int64()),
         "embedding": pa.array([v.tolist() for v in vecs])}
    )
    out = embedding_near_dups(
        ray.data.from_arrow(t), dim=16, threshold=0.999, max_bucket=64
    )
    # windowed comparison: pair count bounded well below n^2/2 = 79800...
    assert 0 < len(out) <= n * 64
    # every doc participates in at least one pair (cluster connectivity)
    seen = set(out["id_a"]) | set(out["id_b"])
    assert len(seen) == n


def test_embedding_near_dups_as_dataset_matches(ray_session):
    """The Dataset-returning scale path must equal the DataFrame wrapper
    exactly (hash-partitioned distinct vs driver drop_duplicates)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from aws_medallion_datalake_ray.functions.embeddings import embedding_near_dups

    rng = np.random.default_rng(5)
    base = rng.standard_normal((60, 16))
    vecs = np.vstack([base, base[:10] + rng.standard_normal((10, 16)) * 0.01])
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs]),
    })
    ds = ray.data.from_arrow(tbl)
    df = embedding_near_dups(ds, dim=16, threshold=0.95)
    got = (embedding_near_dups(ds, dim=16, threshold=0.95, as_dataset=True)
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(df, got, check_dtype=False)
    assert len(df) >= 10  # the planted near-identical vectors all pair up
