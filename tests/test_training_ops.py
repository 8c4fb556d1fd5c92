"""Training-data pipeline operators: text analysis, dedup, similarity,
multimodal plumbing — over the driver-provided sf0.001 tables."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from logspark.operators import dedup, multimodal, similarity, textops

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_token_stats(docs):
    out = textops.with_token_stats(docs).select("doc_id", "text", "n_tokens", "avg_token_len").first()
    assert out["n_tokens"] == len(out["text"].split(" "))
    toks = out["text"].split(" ")
    assert out["avg_token_len"] == pytest.approx(sum(map(len, toks)) / len(toks), abs=1e-6)


def _reference_bpe_encode(word: str, merges=None) -> list[str]:
    """Classic min-rank-first BPE encoder (the HuggingFace/subword-nmt
    shape): repeatedly merge the lowest-ranked adjacent pair present."""
    ranks = {
        tuple(pair): i
        for i, pair in enumerate(textops.TOY_BPE_MERGES if merges is None else merges)
    }
    syms = list(word)
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = (syms[i], syms[i + 1]), r
        if best is None:
            break
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_merge_table_is_valid_cascade():
    """Every multi-char merge component must be the product of an earlier
    merge — the property that makes rank-ordered sequential replace()
    equivalent to the classic min-rank-first encoder."""
    formed = set()
    for x, y in textops.TOY_BPE_MERGES:
        for part in (x, y):
            assert len(part) == 1 or part in formed, (x, y, part)
        formed.add(x + y)
    assert len(formed) == len(textops.TOY_BPE_MERGES)  # no duplicate merges


def test_bpe_token_count_matches_reference_encoder(spark):
    """The native replace()-chain count equals the classic BPE encoder on
    a word list covering single merges, cascades (that/this/with/have),
    unmergeable words, case sensitivity, digits and punctuation."""
    words = [
        "the", "that", "this", "what", "with", "have", "you", "are",
        "was", "not", "for", "can", "thermal", "xyzzy", "q", "The",
        "AND", "ing", "singing", "another", "understanding",
    ]
    text = " ".join(words) + " 123 ... 456!"
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    row = textops.with_bpe_token_count(df).first()
    import re

    pretoks = re.findall(textops.BPE_TOKEN_RE, text)
    expect = sum(
        len(_reference_bpe_encode(t)) if re.fullmatch("[A-Za-z]+", t) else 1
        for t in pretoks
    )
    assert row["n_pretokens"] == len(pretoks)
    assert row["n_tokens_bpe"] == expect
    # merges actually fire: the BPE count is strictly below character count
    assert row["n_tokens_bpe"] < sum(len(t) for t in pretoks)
    # spot-check single words (note "with" is 3: rank-0 (t,h) fires before
    # (i,t), so the 'ith' symbol never forms — classic BPE order effects)
    for w, n in (
        ("the", 1), ("that", 1), ("with", 3),
        ("understanding", 6), ("xyzzy", 5),
    ):
        assert len(_reference_bpe_encode(w)) == n, w
    # empty text → 0 tokens, not null
    empty = spark.createDataFrame([(2, "")], "doc_id bigint, text string")
    r0 = textops.with_bpe_token_count(empty).first()
    assert r0["n_tokens_bpe"] == 0 and r0["n_pretokens"] == 0
    # bpe_tokenize yields the actual pieces, not just their count
    wdf = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["pieces"]
        for r in wdf.select("w", textops.bpe_tokenize(F.col("w")).alias("pieces")).collect()
    }
    for w in words:
        assert got[w] == _reference_bpe_encode(w), w


def test_bpe_pandas_engine_matches_native_and_scales_vocab(spark):
    """VERDICT r4 #3: the pandas-UDF classic encoder path. (a) native ≡
    pandas on the TOY table and on a small TRAINED table (valid cascades
    — the property that makes them interchangeable); (b) a ~1k-merge
    trained table — far past what the native replace-chain should ever
    express as one expression tree — encodes correctly vs the in-test
    reference encoder, and engine='auto' routes it to pandas."""
    import re

    texts = [
        "the thermal understanding of another singing bird",
        "what you are doing with that 123 ... thing!",
        "aaa bbb the the the and and in in xyzzy",
        "",
        "MiXeD CaSe And punctuation; truly?",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")

    # (a) native == pandas on the toy table
    nat = {r["doc_id"]: (r["n_pretokens"], r["n_tokens_bpe"])
           for r in textops.with_bpe_token_count(df, engine="native").collect()}
    pan = {r["doc_id"]: (r["n_pretokens"], r["n_tokens_bpe"])
           for r in textops.with_bpe_token_count(df, engine="pandas").collect()}
    assert nat == pan

    # train a small table on a synthetic corpus; native == pandas on it too
    corpus_rows = [(i, " ".join(texts) + " repetition makes frequency") for i in range(4)]
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    small = textops.train_bpe_merges(corpus, n_merges=30)
    assert len(small) == 30
    formed = set()
    for x, y in small:  # valid cascade by construction
        for part in (x, y):
            assert len(part) == 1 or part in formed, (x, y)
        formed.add(x + y)
    nat2 = {r["doc_id"]: r["n_tokens_bpe"]
            for r in textops.with_bpe_token_count(df, merges=small, engine="native").collect()}
    pan2 = {r["doc_id"]: r["n_tokens_bpe"]
            for r in textops.with_bpe_token_count(df, merges=small, engine="pandas").collect()}
    assert nat2 == pan2

    # determinism: retraining yields the identical table
    assert textops.train_bpe_merges(corpus, n_merges=30) == small

    # (b) ~1k merges: train on a wider synthetic corpus
    import random
    rng = random.Random(11)
    syllables = ["ka", "to", "ri", "nu", "se", "pla", "ver", "mon", "dil", "qua",
                 "bre", "sto", "fin", "gor", "lux", "zen", "arc", "tem", "hol", "wis"]
    words = ["".join(rng.choices(syllables, k=rng.randint(2, 6))) for _ in range(2000)]
    big_corpus = spark.createDataFrame(
        [(i, " ".join(rng.choices(words, k=60))) for i in range(50)],
        "doc_id bigint, text string",
    )
    big = textops.train_bpe_merges(big_corpus, n_merges=1000)
    assert len(big) == 1000
    assert len(big) > textops.NATIVE_MERGE_LIMIT  # auto must go pandas
    out = textops.with_bpe_token_count(df.union(big_corpus.limit(3)), merges=big).collect()
    for r in out:
        pretoks = re.findall(textops.BPE_TOKEN_RE, r["text"])
        expect = sum(
            len(_reference_bpe_encode(t, big)) if re.fullmatch("[A-Za-z]+", t) else 1
            for t in pretoks
        )
        assert r["n_pretokens"] == len(pretoks)
        assert r["n_tokens_bpe"] == expect, r["doc_id"]
    # merges really fire on corpus words: counts shrink vs characters
    big_rows = [r for r in out if r["doc_id"] < 3 and len(r["text"]) > 100]
    assert all(
        r["n_tokens_bpe"] < sum(len(t) for t in re.findall(textops.BPE_TOKEN_RE, r["text"]))
        for r in big_rows
    ) and big_rows


def test_quality(docs):
    row = textops.with_quality(docs).first()
    toks = row["text"].split(" ")
    stop = sum(1 for t in toks if t in textops.STOPWORDS)
    assert row["stopword_ratio"] == pytest.approx(stop / len(toks), abs=1e-6)
    assert isinstance(row["quality_ok"], bool)


def test_lang_guess_deterministic(docs):
    out = textops.with_lang_guess(docs).groupBy("lang_guess").count().collect()
    assert {r["lang_guess"] for r in out} <= {"en", "de", "fr", "und"}


def test_fingerprint_and_exact_dedup(spark, docs):
    fp = textops.with_fingerprint(docs)
    assert fp.select("fingerprint").distinct().count() == fp.count()  # corpus is all-distinct
    # inject a duplicate → dedup catches it
    dup = docs.limit(1).withColumn("doc_id", F.lit(999999))
    d = dedup.exact_dedup(docs.unionByName(dup))
    assert d.filter(F.col("n_dups") > 1).count() == 1
    assert d.count() == docs.count()


def test_simhash_near_dup_detection(spark, docs):
    base = textops.with_simhash(docs.limit(50))
    # a doc with one word changed should be within small hamming distance
    mutated = docs.limit(1).withColumn(
        "doc_id", F.lit(888888)
    ).withColumn("text", F.regexp_replace("text", r"^\w+", "zzzz"))
    both = textops.with_simhash(docs.limit(1).unionByName(mutated))
    a, b = [r["simhash"] for r in both.collect()]
    hamming = bin(a ^ b).count("1")
    assert hamming <= 12  # one-token change flips few bits of a 60-bit simhash


def test_minhash_lsh_finds_planted_near_dup(spark, docs):
    near = docs.limit(1).withColumn("doc_id", F.lit(777777)).withColumn(
        "text", F.concat(F.col("text"), F.lit(" tail"))
    )
    corpus = docs.limit(100).unionByName(near)
    sigs = dedup.minhash_signatures(corpus, n_hashes=16)
    assert sigs.count() == 101
    cand = dedup.lsh_candidates(sigs, n_hashes=16, bands=4)
    planted = cand.filter((F.col("b") == 777777)).collect()
    assert len(planted) >= 1  # the planted pair must surface as a candidate
    # verify stage: exact jaccard of the planted (0, 777777) pair is high
    # (the corpus itself contains natural near-dups, so other hits are fine)
    jac = dedup.ngram_jaccard(corpus, candidates=cand, threshold=0.5)
    hit = jac.filter((F.col("a") == 0) & (F.col("b") == 777777)).collect()
    assert len(hit) == 1 and hit[0]["jaccard"] > 0.8


def test_simhash_bands_integer_keys(spark):
    """Two simhashes agreeing on band 0 MUST pair — the guarantee breaks if
    band keys go through float division (60-bit values exceed double's
    53-bit mantissa, corrupting low-band keys). Regression for ADVICE r1."""
    common_low = 6844  # shared band-0 bits (low 15)
    rows = [
        (1, (1 << 59) | common_low),
        (2, (1 << 58) | common_low),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, simhash bigint")
    pairs = dedup.simhash_bands(df, n_bands=4).collect()
    assert [(r["a"], r["b"]) for r in pairs] == [(1, 2)]


def test_banded_bucket_cap_bounds_pairs(spark):
    """Degenerate corpus: many near-identical docs land in ONE LSH bucket,
    whose self-join is quadratic. The cap must drop it; distinct docs with
    small buckets must survive."""
    clones = [(i, "the same boilerplate text repeated again and again here") for i in range(100)]
    pair = [  # exact dups → identical signatures → guaranteed same bucket
        (1000, "a genuinely unique document about spark partitioning strategy"),
        (1001, "a genuinely unique document about spark partitioning strategy"),
    ]
    docs = spark.createDataFrame(clones + pair, "doc_id bigint, text string")
    sigs = dedup.minhash_signatures(docs, n_hashes=16)
    uncapped = dedup.lsh_candidates(sigs, n_hashes=16, bands=4)
    assert uncapped.count() >= 100 * 99 // 2  # the clone clique explodes
    capped = dedup.lsh_candidates(sigs, n_hashes=16, bands=4, max_bucket=10)
    got = {(r["a"], r["b"]) for r in capped.collect()}
    assert (1000, 1001) in got  # small buckets survive the cap
    assert all(a >= 1000 for a, _ in got)  # the 100-clone bucket is gone
    # simhash banding takes the same defense
    sh = textops.with_simhash(docs)
    sh_capped = dedup.simhash_bands(sh, n_bands=4, max_bucket=10)
    assert all(r["a"] >= 1000 for r in sh_capped.collect())


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing guarantee: any shared token run of length >= w+k-1 (= 8
    here) produces at least one SHARED fingerprint; disjoint docs don't."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"doc one starts here {shared} and then ends differently"),
        (2, f"totally other opening words {shared} closing remarks now"),
        (3, "no overlap with anything else at all whatsoever in here"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fp = dedup.winnow_fingerprints(df, k=5, w=4)
    by_doc = {
        i: {r["fingerprint"] for r in fp.filter(F.col("doc_id") == i).collect()}
        for i in (1, 2, 3)
    }
    assert by_doc[1] & by_doc[2]  # shared run → shared fingerprint
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    # density: far fewer fingerprints than k-grams
    n_grams = len(rows[0][1].split()) - 4
    assert len(by_doc[1]) < n_grams


def test_ngram_jaccard_bounds(docs):
    out = dedup.ngram_jaccard(docs.limit(40))
    bad = out.filter((F.col("jaccard") <= 0) | (F.col("jaccard") > 1)).count()
    assert bad == 0


def test_connected_components_equals_union_find(spark):
    """dedup.connected_components vs a reference union-find, on random
    graphs drawn by hypothesis — including long chains (the pointer-
    doubling stress case) and disjoint cliques (the dedup-typical case)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from logspark.operators.dedup import connected_components

    def uf_components(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # component id = min node in component
        comp = {}
        for n in nodes:
            r = find(n)
            comp.setdefault(r, []).append(n)
        return {n: min(members) for r, members in comp.items() for n in members}

    @given(
        st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda t: t[0] != t[1]),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    def check(edges):
        pairs = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in edges], "a bigint, b bigint"
        )
        got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
        nodes = {n for e in edges for n in e}
        assert got == uf_components(edges, nodes)

    check()
    # deterministic chain: worst case for plain propagation (O(n) rounds),
    # log-rounds with pointer doubling — pin BOTH correctness and the
    # round count so a regression to linear convergence fails loudly
    stats: dict = {}
    chain = spark.createDataFrame([(i, i + 1) for i in range(40)], "a bigint, b bigint")
    got = {
        r["node"]: r["component"]
        for r in connected_components(chain, stats=stats, driver_threshold=0).collect()
    }
    assert got == {i: 0 for i in range(41)}
    # neighbor-min + doubling ≈ halves remaining depth per round:
    # 41-node path converges well under log2-ish rounds + slack
    assert stats["rounds"] <= 9, stats
    assert stats["converged"] is True


def test_connected_components_driver_equals_distributed(spark):
    """The size-gated driver union-find fast path must label EXACTLY like
    the distributed pointer-doubling loop — mixed topology: chains,
    cliques, a star, singleton pairs."""
    from logspark.operators.dedup import connected_components

    edges = (
        [(i, i + 1) for i in range(0, 12)]            # chain
        + [(a, b) for a in range(20, 24) for b in range(a + 1, 24)]  # clique
        + [(30, x) for x in range(31, 37)]            # star
        + [(50, 51), (60, 61)]                        # singleton pairs
    )
    pairs = spark.createDataFrame(edges, "a bigint, b bigint")
    s1, s2 = {}, {}
    drv = {
        r["node"]: r["component"]
        for r in connected_components(pairs, stats=s1).collect()
    }
    dist = {
        r["node"]: r["component"]
        for r in connected_components(pairs, stats=s2, driver_threshold=0).collect()
    }
    assert s1["strategy"] == "driver-union-find" and s2["strategy"] == "distributed"
    assert drv == dist
    assert drv[23] == 20 and drv[36] == 30 and drv[61] == 60


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir switches the loop to RELIABLE checkpoint() (survives
    executor loss on a real cluster — VERDICT r3 #5): same labels as the
    localCheckpoint default, and checkpoint files actually land on disk."""
    import os

    from logspark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(20)] + [(100, 101), (101, 102)],
        "a bigint, b bigint",
    )
    ckdir = str(tmp_path / "cc_ck")
    stats: dict = {}
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            chain, stats=stats, checkpoint_dir=ckdir, driver_threshold=0
        ).collect()
    }
    expect = {i: 0 for i in range(21)} | {100: 100, 101: 100, 102: 100}
    assert got == expect
    assert stats["converged"] is True
    # reliable checkpoints write rdd-* dirs under the checkpoint dir
    found = [
        f for root, _, files in os.walk(ckdir) for f in files if f.startswith("part-")
    ]
    assert found, f"no reliable checkpoint files under {ckdir}"


def test_connected_components_warns_on_max_iter_exhaustion(spark):
    """Non-convergence is loud (ADVICE r3): max_iter too small → warning +
    converged=False in stats, never a silent wrong answer."""
    import warnings

    from logspark.operators.dedup import connected_components

    chain = spark.createDataFrame([(i, i + 1) for i in range(60)], "a bigint, b bigint")
    stats: dict = {}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(chain, max_iter=1, stats=stats, driver_threshold=0).collect()
    assert stats["converged"] is False
    assert any("no fixpoint" in str(x.message) for x in w), [str(x.message) for x in w]


def test_dedup_apply_partition_invariants(spark, docs):
    """dedup_apply turns pairs into decisions correctly: survivors and
    dropped partition the corpus; each cluster keeps exactly its min-id
    member; every dropped doc shares a verified pair with a member of its
    own cluster (it was not dropped by accident of labeling)."""
    sigs = dedup.minhash_signatures(docs, n_hashes=16)
    cand = dedup.lsh_candidates(sigs, n_hashes=16, bands=4, max_bucket=20)
    pairs = dedup.ngram_jaccard(docs, threshold=0.5, candidates=cand).cache()

    clusters = dedup.dedup_clusters(pairs).cache()
    surviving = dedup.dedup_apply(docs, pairs).cache()

    n_docs = docs.count()
    cl = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    surv = {r["doc_id"] for r in surviving.select("doc_id").collect()}
    dropped = {d for d, c in cl.items() if d != c}
    assert len(cl) > 0 and len(dropped) > 0  # non-vacuous on this corpus

    # partition: survivors ∪ dropped = corpus, disjoint
    assert len(surv) + len(dropped) == n_docs
    assert not (surv & dropped)
    # exactly one survivor per cluster, and it is the min member
    by_cluster: dict = {}
    for d, c in cl.items():
        by_cluster.setdefault(c, []).append(d)
    for c, members in by_cluster.items():
        assert min(members) == c
        assert [m for m in members if m in surv] == [c]
    # every dropped doc has a verified pair with a same-cluster member
    plist = [(r["a"], r["b"]) for r in pairs.collect()]
    nbrs: dict = {}
    for a, b in plist:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for d in dropped:
        assert any(cl.get(n) == cl[d] for n in nbrs.get(d, ())), d
    # the audit row agrees with the collected ground truth
    st = dedup.dedup_stats(docs, clusters).collect()[0]
    assert st["n_docs"] == n_docs
    assert st["n_clustered_docs"] == len(cl)
    assert st["n_clusters"] == len(by_cluster)
    assert st["n_dropped"] == len(dropped)
    assert st["dup_rate"] == pytest.approx(len(dropped) / n_docs, abs=1e-6)
    assert st["max_cluster_size"] == max(len(m) for m in by_cluster.values())
    # empty-cluster edge: zero rows -> zeros, not nulls
    empty = dedup.dedup_stats(docs, clusters.limit(0)).collect()[0]
    assert (empty["n_clusters"], empty["n_dropped"], empty["dup_rate"]) == (0, 0, 0.0)
    pairs.unpersist(); clusters.unpersist(); surviving.unpersist()


def test_incremental_dedup_equals_full_run(spark, docs, tmp_path):
    """Two incremental runs through a SignatureStore produce the same
    verified pair set AND the same dedup_apply surviving set as a one-shot
    whole-corpus run; the store refuses duplicate run ids and signatures
    are computed once per batch (store holds both runs afterwards)."""
    store = dedup.SignatureStore(str(tmp_path / "sigs"))
    # THREE batches (not just the gated query's two): every pair {x, y}
    # must be emitted by exactly the run that ingests its later member,
    # whichever of the 3x3 batch combinations it spans
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    parts = [
        dedup.incremental_near_dup_pairs(store, b, docs, run_id=f"r-{i}", threshold=0.5)
        for i, b in enumerate(batches)
    ]
    pa, pb = parts[0], parts[1].unionByName(parts[2])
    inc = {(r["a"], r["b"]) for r in pa.unionByName(pb).collect()}

    sigs = dedup.minhash_signatures(docs, n_hashes=16)
    cand = dedup.lsh_candidates(sigs, n_hashes=16, bands=4)
    full_pairs = dedup.ngram_jaccard(docs, threshold=0.5, candidates=cand)
    full = {(r["a"], r["b"]) for r in full_pairs.collect()}
    assert inc == full and len(full) > 0

    # decisions agree too: same surviving corpus either way
    inc_surv = {r["doc_id"] for r in dedup.dedup_apply(docs, pa.unionByName(pb)).select("doc_id").collect()}
    full_surv = {r["doc_id"] for r in dedup.dedup_apply(docs, full_pairs).select("doc_id").collect()}
    assert inc_surv == full_surv

    assert store.committed_runs() == ["r-0", "r-1", "r-2"]
    assert store.load(spark).count() == dedup.minhash_signatures(docs).count()
    with pytest.raises(ValueError, match="already committed"):
        dedup.incremental_near_dup_pairs(store, batches[2], docs, run_id="r-2")


def test_signature_store_compact(spark, docs, tmp_path):
    """compact() folds all runs into one deterministic directory with the
    identical signature set, sweeps stale dirs, and the store keeps
    accepting incremental batches afterwards."""
    import os

    store = dedup.SignatureStore(str(tmp_path / "sigs"))
    thirds = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, b in enumerate(thirds[:2]):
        store.append(dedup.minhash_signatures(b), run_id=f"r-{i}")
    before = {r["doc_id"] for r in store.load(spark).select("doc_id").collect()}

    store.compact(spark)
    assert len(store.committed_runs()) == 1
    cid = store.committed_runs()[0]
    assert cid.startswith("compact-")
    after = {r["doc_id"] for r in store.load(spark).select("doc_id").collect()}
    assert after == before
    assert sorted(os.listdir(tmp_path / "sigs" / "runs")) == [cid]

    # still appendable post-compact; incremental run against compacted store
    pairs = dedup.incremental_near_dup_pairs(store, thirds[2], docs, run_id="r-2")
    assert pairs.count() >= 0
    assert store.committed_runs() == [cid, "r-2"]
    # idempotent no-op on a single-run store (sweep keeps both dirs live)
    store.compact(spark)
    assert len(store.committed_runs()) == 1  # re-compacted to one again


def test_cosine_topk_matches_numpy(emb):
    import numpy as np

    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    q = rows[0]
    sims = {
        i: float(np.dot(v, q) / (np.linalg.norm(v) * np.linalg.norm(q)))
        for i, v in rows.items()
        if i != 0
    }
    expected = sorted(sims.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:5]
    got = similarity.cosine_topk(emb, query_id=0, k=5).collect()
    assert [r["vec_id"] for r in got] == [i for i, _ in expected]
    for r, (_, s) in zip(got, expected):
        assert r["sim"] == pytest.approx(s, abs=1e-5)


def test_ann_topk_subset_of_bucket(emb):
    got = similarity.ann_topk(emb, query_id=0, n_anchors=4, k=5).collect()
    assert 0 < len(got) <= 5
    assert all(-1.0 <= r["sim"] <= 1.0 for r in got)
    # ANN results are true cosine values: spot-check against brute force
    brute = {r["vec_id"]: r["sim"] for r in similarity.cosine_topk(emb, 0, k=500).collect()}
    for r in got:
        assert r["sim"] == pytest.approx(brute[r["vec_id"]], abs=1e-6)


def test_embedding_near_dups_threshold(emb):
    out = similarity.embedding_near_dups(emb.limit(120), threshold=0.9, n_anchors=4)
    assert out.filter(F.col("sim") < 0.9).count() == 0


def test_pair_kernel_fold_exactness(spark):
    """r6: the applyInPandas pair-scoring and mapInPandas assignment
    kernels must reproduce the declarative fold BIT-exactly — every
    (a, b, sim) of ivf_near_dups equals the r5 join form's
    round(aggregate-fold cosine, 6) computed via _dot/_norm, including at
    an exact 6dp half boundary where np.round (half-even) and F.round
    (HALF_UP) diverge — the two-stage cut must pick HALF_UP."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(200)]
    # plant an exact-threshold pair: identical vectors → sim 1.0, plus a
    # scaled copy (cosine 1.0) and near-boundary values via the raw data
    rows.append((200, rows[5][1]))
    rows.append((201, [x * 2.0 for x in rows[5][1]]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    got = similarity.ivf_near_dups(emb, threshold=0.2, n_cells=8, nprobe=2)

    # the r5 declarative join form, reconstructed expression-for-expression
    from logspark.operators.dedup import cap_buckets  # noqa: F401 (parity of shape)
    from logspark.operators.similarity import _dot, _norm, head_centroids, ivf_assign_multi

    m = ivf_assign_multi(emb, head_centroids(emb, 8), 2).localCheckpoint(eager=True)
    l = m.select(F.col("vec_id").alias("a"), F.col("embedding").cast("array<double>").alias("va"), "cell")
    r = m.select(F.col("vec_id").alias("b"), F.col("embedding").cast("array<double>").alias("vb"), "cell")
    ref = (
        l.join(r, "cell")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))), 6).alias("sim"))
        .filter(F.col("sim") >= 0.2)
        .distinct()
    )
    g = sorted(map(tuple, got.collect()))
    e = sorted(map(tuple, ref.collect()))
    assert g == e  # exact equality, float bits included
    assert any(a == 5 and b == 200 and s == 1.0 for a, b, s in g)

    # HALF_UP at the 6dp half boundary: builtin/np round gives 0.123456,
    # Spark F.round gives 0.123457 — the kernel must match Spark
    from logspark.functions.rounding import round_half_up6

    assert round_half_up6(0.1234565) == 0.123457


def test_default_ann_recall_meets_floor(spark):
    """The recommended/default ANN config (IVF — what embedding_near_dups
    runs) must keep recall@10 ≥ ANN_RECALL_FLOOR on the test embeddings;
    sign-LSH measured 0.0 there, which is why it is no longer the default
    (VERDICT r3 #6)."""
    from logspark.queries import ANN_RECALL_FLOOR, q_ann_recall

    rows = {r["method"]: r for r in q_ann_recall(spark, "/root/testdata/sf0.001").collect()}
    default = [r for r in rows.values() if r["is_default"]]
    assert len(default) == 1 and default[0]["method"] == "ivf"
    assert default[0]["recall_at_10"] >= ANN_RECALL_FLOOR
    assert default[0]["meets_floor"] is True


def test_ivf_assign_multi_matches_argmax_and_recovers_boundary_pairs(spark, emb):
    """Multi-probe assignment: rank-1 cell equals the single-assign argmax
    for every vector (same tie-break), each vector gets exactly nprobe
    cells, and the IVF near-dup pair set is a superset of what
    single-assignment bucketing would find (boundary pairs recovered)."""
    sub = emb.limit(200)
    cent = similarity.head_centroids(sub, 5)
    single = {r["vec_id"]: r["cell"] for r in similarity.ivf_assign(sub, cent).collect()}
    multi = similarity.ivf_assign_multi(sub, cent, nprobe=2).collect()
    per_vec: dict = {}
    for r in multi:
        per_vec.setdefault(r["vec_id"], []).append(r["cell"])
    assert all(len(cs) == 2 and len(set(cs)) == 2 for cs in per_vec.values())
    # the top cell (first explode order) is the argmax cell
    firsts = {vid: cs[0] for vid, cs in per_vec.items()}
    assert firsts == single
    # pair superset: single-assign cells ⊂ multi-probe cells
    pairs_multi = {
        (r["a"], r["b"])
        for r in similarity.ivf_near_dups(sub, threshold=0.3, n_cells=5, nprobe=2).collect()
    }
    single_cells = spark.createDataFrame(
        [(v, c) for v, c in single.items()], "vec_id bigint, cell int"
    )
    j = sub.join(single_cells, "vec_id")
    l = j.select(F.col("vec_id").alias("a"), F.col("embedding").cast("array<double>").alias("va"), "cell")
    r_ = j.select(F.col("vec_id").alias("b"), F.col("embedding").cast("array<double>").alias("vb"), "cell")
    from logspark.operators.similarity import _dot, _norm

    pairs_single = {
        (row["a"], row["b"])
        for row in l.join(r_, "cell")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.round(_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))), 6).alias("sim"),
        )
        .filter(F.col("sim") >= 0.3)
        .collect()
    }
    assert pairs_single <= pairs_multi
    assert len(pairs_multi) > len(pairs_single)  # boundary pairs actually recovered


def test_multimodal_feature_extraction(spark):
    media = multimodal.synth_media_df(spark, 30)
    feats = multimodal.extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(r["n_bytes"] > 0 and r["frame_count"] >= 1 for r in rows)
    assert all(not math.isnan(r["feat_mean"]) for r in rows)
    # deterministic: same input → same features
    again = {r["media_id"]: r["feat_mean"] for r in multimodal.extract_features(media, fake=True).collect()}
    assert all(again[r["media_id"]] == r["feat_mean"] for r in rows)


def test_multimodal_real_decoder_gated(spark):
    media = multimodal.synth_media_df(spark, 3)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        multimodal.extract_features(media, fake=False).collect()


def test_multimodal_resize(spark):
    media = multimodal.synth_media_df(spark, 30)
    resized = multimodal.resize_images(media, target_w=8, target_h=4, fake=True)
    rows = {r["media_id"]: r for r in resized.collect()}
    assert len(rows) == 30
    for mid, r in rows.items():
        if r["media_type"].startswith("image/"):
            assert (r["width"], r["height"]) == (8, 4)
            assert len(r["content"]) == 8 * 4
        else:  # pass-through
            assert (r["width"], r["height"]) == (0, 0) or r["height"] == 0
    # deterministic resample
    again = {r["media_id"]: bytes(r["content"]) for r in resized.collect()}
    assert all(bytes(rows[m]["content"]) == c for m, c in again.items())


def test_operators_tolerate_empty_inputs(spark):
    """Degenerate-input armor: every dedup-family operator is total on
    empty corpora / empty pair sets (a scheduled pipeline tick over an
    empty partition must not crash)."""
    empty_docs = spark.createDataFrame([], "doc_id bigint, text string")
    empty_pairs = spark.createDataFrame([], "a bigint, b bigint")

    assert dedup.exact_dedup(empty_docs).count() == 0
    sigs = dedup.minhash_signatures(empty_docs)
    assert sigs.count() == 0
    assert dedup.lsh_candidates(sigs).count() == 0
    assert dedup.ngram_jaccard(empty_docs, candidates=empty_pairs).count() == 0
    assert dedup.winnow_fingerprints(empty_docs).count() == 0
    assert dedup.connected_components(empty_pairs).count() == 0
    assert dedup.dedup_clusters(empty_pairs).count() == 0

    # empty pair set -> the corpus passes through untouched
    docs = spark.createDataFrame([(1, "a b c"), (2, "d e f")], "doc_id bigint, text string")
    assert dedup.dedup_apply(docs, empty_pairs).count() == 2

    # single-doc corpus: no pairs anywhere, survivor is itself
    one = spark.createDataFrame([(7, "x y z w v u")], "doc_id bigint, text string")
    s1 = dedup.minhash_signatures(one)
    assert dedup.lsh_candidates(s1).count() == 0
    assert dedup.dedup_apply(one, empty_pairs).count() == 1

    # IVF guards (ADVICE r3): empty corpus / empty centroids fail with a
    # NAMED error at plan time, not a shape error inside an executor
    empty_emb = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="corpus is empty"):
        similarity.train_ivf_centroids(empty_emb, k=4)
    some_emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id bigint, embedding array<float>"
    )
    empty_cent = spark.createDataFrame([], "cell int, cvec array<double>")
    with pytest.raises(ValueError, match="centroids is empty"):
        similarity.ivf_assign_vectorized(some_emb, empty_cent)


def test_chunking_reconstructs_and_overlaps(spark):
    """Chunks cover the doc exactly with `overlap` shared tokens between
    neighbors; concatenating each chunk minus its overlap re-yields the
    original token stream."""
    text = " ".join(f"t{i}" for i in range(150))
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    out = textops.chunk_documents(df, chunk_tokens=64, overlap=8)
    rows = sorted(out.collect(), key=lambda r: r["chunk_idx"])
    stride = 56
    toks = text.split(" ")
    assert len(rows) == (150 - 1) // stride + 1
    rebuilt = []
    for r in rows:
        ct = r["chunk_text"].split(" ")
        assert ct == toks[r["chunk_idx"] * stride : r["chunk_idx"] * stride + 64]
        rebuilt.extend(ct if r["chunk_idx"] == 0 else ct[8:])
    assert rebuilt == toks
    # neighbors share exactly the 8 overlap tokens
    assert rows[0]["chunk_text"].split(" ")[-8:] == rows[1]["chunk_text"].split(" ")[:8]


def test_mixture_sample_budget_boundary(spark, docs):
    """No selected source exceeds its budget, and for every source the
    NEXT doc (first unselected) would have pushed it over — the cut is
    tight, not arbitrary."""
    budgets = {"src0": 800, "src1": 600}
    out = textops.mixture_sample(docs, budgets)
    got = out.collect()
    assert got and {r["source"] for r in got} <= set(budgets)
    per_src: dict = {}
    for r in got:
        per_src.setdefault(r["source"], []).append(r)
    all_toks = {
        (r["doc_id"], r["source"]): r["nt"]
        for r in docs.select(
            "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("nt")
        ).collect()
    }
    for src, rows in per_src.items():
        rows.sort(key=lambda r: r["doc_id"])
        assert rows[-1]["cum_tokens"] <= budgets[src]
        nxt = sorted(
            d for (d, s) in all_toks if s == src and d > rows[-1]["doc_id"]
        )
        if nxt:  # the first unselected doc would exceed the budget
            assert rows[-1]["cum_tokens"] + all_toks[(nxt[0], src)] > budgets[src]


def test_mixture_sample_ratios(spark):
    """Ratio-form spec == absolute budgets at floor(total*ratio); invalid
    specs fail loudly at plan time."""
    rows = [(i, f"src{i % 2}", " ".join(["w"] * 10)) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id int, source string, text string")
    via_ratios = textops.mixture_sample_ratios(
        docs, total_tokens=1000, ratios={"src0": 0.3, "src1": 0.2}
    ).collect()
    via_budgets = textops.mixture_sample(docs, {"src0": 300, "src1": 200}).collect()
    assert sorted(map(tuple, via_ratios)) == sorted(map(tuple, via_budgets))
    for bad, msg in (
        ({}, "empty"),
        ({"src0": -0.1}, "non-positive"),
        ({"src0": 0.9, "src1": 0.2}, "> 1"),
        ({"src0": 1e-9}, "floors to 0"),
    ):
        with pytest.raises(ValueError, match=msg):
            textops.mixture_sample_ratios(docs, 1000, bad)


def test_mixture_sample_spreads_window_across_buckets(spark):
    """Scale shape (VERDICT r3 #4): the running sum must NOT be one window
    partition per source.  With num_buckets=6 the physical Window node
    keys on (_bkt, source), each source's ledger spans >1 bucket, and the
    result still equals the naive single-window-per-source computation."""
    from pyspark.sql.window import Window

    rows = [
        (i, f"src{i % 3}", " ".join(["w"] * (5 + i % 17)))
        for i in range(600)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, source string, text string")
    budgets = {"src0": 1500, "src1": 900, "src2": 2500}
    out = textops.mixture_sample(docs, budgets, num_buckets=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    win_lines = [l for l in plan.split("\n") if "Window" in l and "windowspecdefinition" in l]
    assert win_lines and all("_bkt" in l for l in win_lines), plan
    # no Window node partitioned on source alone
    got = {(r["doc_id"], r["cum_tokens"]) for r in out.collect()}
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    budget = F.when(F.col("source") == "src0", 1500).when(
        F.col("source") == "src1", 900
    ).when(F.col("source") == "src2", 2500)
    naive = {
        (r["doc_id"], r["cum_tokens"])
        for r in docs.withColumn("n_tokens", F.size(F.split("text", " ")).cast("long"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
        .collect()
    }
    assert got == naive
    # every source's selected prefix really spans >1 range bucket: rebuild
    # the bucket assignment the operator used and count distinct buckets
    base = (
        docs.filter(F.col("source").isin(list(budgets)))
        .select("doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
        .repartitionByRange(6, F.col("source"), F.col("doc_id"))
        .withColumn("_bkt", F.spark_partition_id())
    )
    ledger = {
        r["source"]: r["nb"]
        for r in base.groupBy("source").agg(F.countDistinct("_bkt").alias("nb")).collect()
    }
    assert all(nb > 1 for nb in ledger.values()), ledger  # no whole-source bucket
    # and at least one selected prefix crosses a bucket boundary, so the
    # exclusive-offset stitching is exercised (not just bucket 0 output)
    sel_ids = {d for (d, _) in got}
    touched = {
        r["source"]: r["nb"]
        for r in base.filter(F.col("doc_id").isin(list(sel_ids)))
        .groupBy("source")
        .agg(F.countDistinct("_bkt").alias("nb"))
        .collect()
    }
    assert any(nb > 1 for nb in touched.values()), touched


def test_dropped_buckets_report(spark):
    """No silent caps: the audit report names exactly the buckets the cap
    drops, with their sizes."""
    clones = [(i, "the same boilerplate text repeated again and again here") for i in range(30)]
    pair = [
        (1000, "a genuinely unique document about spark partitioning strategy"),
        (1001, "a genuinely unique document about spark partitioning strategy"),
    ]
    df = spark.createDataFrame(clones + pair, "doc_id bigint, text string")
    banded = dedup.band_signatures(dedup.minhash_signatures(df, n_hashes=16))
    rep = dedup.dropped_buckets(banded, max_bucket=10).collect()
    assert rep and all(r["bucket_size"] == 30 for r in rep)  # only the clone buckets
    # consistency: capped join drops exactly the docs of the reported buckets
    capped = dedup.cap_buckets(banded, 10)
    assert capped.filter(F.col("doc_id") < 1000).count() == 0
    assert capped.filter(F.col("doc_id") >= 1000).count() > 0


def test_approx_distinct_within_rsd(spark):
    """HLL++ distinct counts land within a few rsd of exact on the events
    table, per group — the scale-true form of the gated distinct_users."""
    from logspark.operators import aggregates

    ev = spark.read.parquet(f"{SF_DIR}/../sf0.01/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["n_approx"]
        for r in aggregates.approx_distinct(ev, ["event_type"], "user_id", rsd=0.02).collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.1 * n), (k, approx[k], n)


def test_approx_quantiles_bracket_exact(spark):
    """percentile_approx at accuracy=10k on the events value column: each
    approximate quantile must land within a tight rank window of the
    exact percentile."""
    from logspark.operators import aggregates

    ev = spark.read.parquet(f"{SF_DIR}/../sf0.01/events.parquet")
    got = aggregates.approx_quantiles(
        ev, ["event_type"], "value", probabilities=[0.5, 0.95]
    ).collect()
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for r in got:
        xs = sorted(vals[r["event_type"]])
        for p, col in ((0.5, "q_0_5"), (0.95, "q_0_95")):
            # rank window: ±(1/accuracy + slack) of n around the target rank
            lo = xs[max(0, int((p - 0.01) * len(xs)) - 1)]
            hi = xs[min(len(xs) - 1, int((p + 0.01) * len(xs)))]
            assert lo <= r[col] <= hi, (r["event_type"], p, r[col], lo, hi)


def test_sample_frames_explodes_and_caps(spark):
    """Frame sampling: non-image media explodes into stride-sized byte
    slices that reassemble to the original content; images yield one
    frame; max_frames caps fan-out with the first frame kept; the real
    decode path names its missing dependency."""
    media = multimodal.synth_media_df(spark, 24)
    frames = multimodal.sample_frames(media, frame_stride=100).collect()
    raw = {r["media_id"]: (bytes(r["content"]), r["media_type"]) for r in media.collect()}
    by_media: dict = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(raw)
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r["frame_idx"])
        content, mtype = raw[mid]
        assert [r["frame_idx"] for r in rows] == list(range(len(rows)))
        if mtype.startswith("image/"):
            assert len(rows) == 1 and bytes(rows[0]["frame"]) == content
        else:
            assert b"".join(bytes(r["frame"]) for r in rows) == content
            assert all(r["n_frame_bytes"] <= 100 for r in rows)
    # cap: at most 3 frames per media, first frame always present
    capped = multimodal.sample_frames(media, frame_stride=50, max_frames=3).collect()
    per: dict = {}
    for r in capped:
        per.setdefault(r["media_id"], []).append(r)
    for mid, rows in per.items():
        assert len(rows) <= 3
        first = min(rows, key=lambda r: r["frame_idx"])
        assert bytes(first["frame"]) == raw[mid][0][:50] or raw[mid][1].startswith("image/")
    # real path is honestly stubbed
    with pytest.raises(Exception, match="Pillow|av/ffmpeg"):
        multimodal.sample_frames(media, fake=False).collect()


def test_incremental_ivf_near_dups_equals_one_shot(spark, emb, tmp_path):
    """Embedding sibling of the incremental MinHash guarantee: vectors
    ingested batch-by-batch into a cell-partitioned store yield, as the
    union of per-run pairs, EXACTLY the one-shot ivf_near_dups pair set
    (same fixed centroids, sims bit-identical); the store scan is pruned
    to the new batch's cells (PartitionFilters in the plan); replay
    recomputes a run's pairs without re-appending."""
    from logspark.operators.dedup import SignatureStore

    C = similarity.head_centroids(emb, 6).localCheckpoint(eager=True)
    ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    batches = [
        emb.filter(F.col("vec_id") <= cuts[0]),
        emb.filter((F.col("vec_id") > cuts[0]) & (F.col("vec_id") <= cuts[1])),
        emb.filter(F.col("vec_id") > cuts[1]),
    ]
    store = SignatureStore(str(tmp_path / "vstore"))
    got: set = set()
    per_run: list[set] = []
    for i, b in enumerate(batches):
        p = {
            (r["a"], r["b"], r["sim"])
            for r in similarity.incremental_ivf_near_dups(
                store, b, C, run_id=f"r{i}", threshold=0.35
            ).collect()
        }
        per_run.append(p)
        got |= p
    one = {
        (r["a"], r["b"], r["sim"])
        for r in similarity.ivf_near_dups(emb, threshold=0.35, centroids=C).collect()
    }
    assert got == one and one  # non-vacuous, sims bit-identical

    # storage-level pruning: a cell filter over the partitioned store
    # becomes a PartitionFilter in every run's scan branch
    import re

    scan = store.load_runs_union(spark).filter(F.col("cell").isin([0, 1]))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"PartitionFilters: \[cell#\d+ IN \(0,1\)\]", plan)) == 3

    # crash replay: same pairs, no duplicate vectors in the store
    p2 = {
        (r["a"], r["b"], r["sim"])
        for r in similarity.incremental_ivf_near_dups(
            store, batches[2], C, run_id="r2", replay=True, threshold=0.35
        ).collect()
    }
    assert p2 == per_run[2]
    rows = store.load_runs_union(spark).groupBy("vec_id", "cell").count().collect()
    assert all(r["count"] == 1 for r in rows)


def test_embed_dedup_agent_ticks_equal_one_shot(spark, emb, tmp_path):
    """Continuous EMBEDDING dedup agent: vector files arriving across
    ticks yield exactly the one-shot ivf_near_dups pair set on the pinned
    centroids; a crash between store and manifest commit with a NEW file
    arriving before retry replays per-file (no duplicate vectors); the
    centroids pinned by tick 1 are reused verbatim by later ticks."""
    import os

    from logspark.operators.dedup import SignatureStore
    from logspark.plans import dedup_agent
    from logspark.sources import manifest as mf
    from logspark.sources.tableio import ParquetIO

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    n = len(pdf)
    chunks = [pdf.iloc[: n // 3], pdf.iloc[n // 3 : 2 * n // 3], pdf.iloc[2 * n // 3 :]]
    tbl = tmp_path / "in" / "vecs.parquet"
    tbl.mkdir(parents=True)
    io = ParquetIO(str(tmp_path / "in"))
    sink = str(tmp_path / "eagent")

    chunks[0].to_parquet(tbl / "f0.parquet")
    r0 = dedup_agent.embed_dedup_tick(spark, io, "vecs", sink, threshold=0.35)
    assert r0["run_id"]

    # tick 2 "crashes" after the store commit: drop its manifest entry
    chunks[1].to_parquet(tbl / "f1.parquet")
    r1 = dedup_agent.embed_dedup_tick(spark, io, "vecs", sink, threshold=0.35)
    m = mf.load_manifest(sink)
    mf.save_manifest(sink, mf.Manifest(runs=[r for r in m.runs if r.run_id != r1["run_id"]]))

    chunks[2].to_parquet(tbl / "f2.parquet")  # new arrival before retry
    r2 = dedup_agent.embed_dedup_tick(spark, io, "vecs", sink, threshold=0.35)
    assert r2["run_id"] != r1["run_id"]
    assert any(f.endswith("f1.parquet") for f in r2["replayed_files"])

    store = SignatureStore(os.path.join(sink, "vstore"))
    rows = store.load_runs_union(spark).groupBy("vec_id", "cell").count().collect()
    assert all(r["count"] == 1 for r in rows)  # replay never re-appended

    pinned = spark.read.parquet(os.path.join(sink, "centroids"))
    one = {
        (r["a"], r["b"])
        for r in similarity.ivf_near_dups(emb, threshold=0.35, centroids=pinned).collect()
    }
    got = {(r["a"], r["b"]) for r in dedup_agent.all_pairs(spark, sink).collect()}
    assert got == one and one


def test_watch_embed_dedup_with_compaction_and_pin_crash(spark, emb, tmp_path):
    """The embedding watch loop: per-file ticks with vstore compaction
    (partitioned layout + provenance survive), pinned centroids reused
    across ticks, and a CRASHED first-tick centroid pin (temp dir left
    behind, final dir absent) recovers on retry — the write-then-rename
    discipline (r5 review finding 3)."""
    import os

    from logspark.operators.dedup import SignatureStore
    from logspark.plans import dedup_agent
    from logspark.sources.tableio import ParquetIO

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    n = len(pdf)
    tbl = tmp_path / "in" / "vecs.parquet"
    tbl.mkdir(parents=True)
    io = ParquetIO(str(tmp_path / "in"))
    sink = str(tmp_path / "weagent")
    os.makedirs(sink, exist_ok=True)

    # simulate a crash mid-pin BEFORE any tick: a stale tmp dir exists
    os.makedirs(os.path.join(sink, "centroids.tmp", "_temporary"), exist_ok=True)

    for i, lo in enumerate(range(0, n, n // 3 + 1)):
        pdf.iloc[lo : lo + n // 3 + 1].to_parquet(tbl / f"f{i}.parquet")
        dedup_agent.watch_embed_dedup(
            spark, io, "vecs", sink,
            interval_s=0.01, max_iterations=1, compact_every=2, threshold=0.35,
        )
    assert os.path.isdir(os.path.join(sink, "centroids"))  # pin recovered

    store = SignatureStore(os.path.join(sink, "vstore"))
    assert len(store.committed_runs()) < 3  # compaction fired
    assert store.files_complete() and len(store.committed_files()) == 3
    rows = store.load_runs_union(spark).groupBy("vec_id", "cell").count().collect()
    assert all(r["count"] == 1 for r in rows)
    run_dir = os.path.join(sink, "vstore", "runs", store.committed_runs()[0])
    assert any(d.startswith("cell=") for d in os.listdir(run_dir))

    pinned = spark.read.parquet(os.path.join(sink, "centroids"))
    one = {
        (r["a"], r["b"])
        for r in similarity.ivf_near_dups(emb, threshold=0.35, centroids=pinned).collect()
    }
    got = {(r["a"], r["b"]) for r in dedup_agent.all_pairs(spark, sink).collect()}
    assert got == one and one


def test_vector_store_compaction_partitioned_and_legacy_semantics(spark, emb, tmp_path):
    """r5 review fixes: (a) compacting a CELL-PARTITIONED store must use
    the per-run union load (the multi-path read throws
    CONFLICTING_DIRECTORY_STRUCTURES on partitioned run dirs) and keep
    the partitioned layout + pruning; (b) compaction must NOT fabricate
    complete provenance when a legacy run was appended without
    input_files — files_complete() stays False across compaction."""
    import os
    import re

    from logspark.operators.dedup import SignatureStore

    C = similarity.head_centroids(emb, 4)
    m = similarity.ivf_assign_multi(emb, C, nprobe=2)
    ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    half = ids[len(ids) // 2]

    # (a) partitioned store: two runs, compact, layout + pruning survive
    vs = SignatureStore(str(tmp_path / "vs"))
    vs.append(m.filter(F.col("vec_id") <= half), "r0",
              input_files=["f0"], partition_by=["cell"])
    vs.append(m.filter(F.col("vec_id") > half), "r1",
              input_files=["f1"], partition_by=["cell"])
    before = {(r["vec_id"], r["cell"]) for r in vs.load_runs_union(spark).collect()}
    vs.compact(spark)
    assert len(vs.committed_runs()) == 1
    after = {(r["vec_id"], r["cell"]) for r in vs.load_runs_union(spark).collect()}
    assert after == before
    assert vs.committed_files() == {"f0", "f1"} and vs.files_complete()
    run_dir = os.path.join(str(tmp_path / "vs"), "runs", vs.committed_runs()[0])
    assert any(d.startswith("cell=") for d in os.listdir(run_dir))  # layout kept
    plan = (
        vs.load_runs_union(spark)
        .filter(F.col("cell") == 0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert re.search(r"PartitionFilters: \[.*cell", plan)

    # (b) legacy run without provenance: incompleteness survives compaction
    ls = SignatureStore(str(tmp_path / "ls"))
    sigs = spark.createDataFrame([(1, 7), (2, 9)], "doc_id bigint, h bigint")
    ls.append(sigs, "legacy")  # no input_files
    ls.append(spark.createDataFrame([(3, 5)], "doc_id bigint, h bigint"),
              "new", input_files=["fX"])
    assert not ls.files_complete()
    ls.compact(spark)
    assert len(ls.committed_runs()) == 1
    assert not ls.files_complete()  # compaction did not fabricate provenance
    assert "fX" in ls.committed_files()


def test_ivf_index_partition_pruned_search(spark, emb, tmp_path):
    """write_ivf_index persists the corpus partitioned by IVF cell;
    ivf_topk_indexed's probe-cell isin becomes a STATIC partition filter,
    so the scan touches only nprobe of the cell directories (the 100 TB
    I/O story — asserted via inputFiles), while returning exactly the
    same top-k as the in-memory ivf_topk on the same centroids."""
    import os

    cents = similarity.head_centroids(emb, 6)
    path = str(tmp_path / "ivf")
    similarity.write_ivf_index(emb, cents, path)
    on_disk = [d for d in os.listdir(path) if d.startswith("cell=")]
    assert len(on_disk) >= 3  # multiple cells materialized

    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    got = similarity.ivf_topk_indexed(
        spark, path, cents, qvec, nprobe=2, k=10, exclude_id=0
    )
    ref = similarity.ivf_topk(emb, query_id=0, n_anchors=6, nprobe=2, k=10)
    assert [(r["vec_id"], r["sim"]) for r in got.collect()] == [
        (r["vec_id"], r["sim"]) for r in ref.collect()
    ]
    # partition pruning: the probe-cell isin is a STATIC PartitionFilter
    # in the executed plan (inputFiles() reports the pre-pruning relation,
    # so inspect the plan itself)
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[cell#\d+ IN \(([\d,]+)\)\]", plan)
    assert m, plan
    assert len(m.group(1).split(",")) == 2  # exactly nprobe cells scanned
    assert len(on_disk) > 2  # i.e. pruning actually skipped directories


def test_ann_recall_trained_centroids_meets_floor(spark, emb):
    """VERDICT r4 #8: the RECOMMENDED production IVF config — centroids
    from the deterministic k-means (train_ivf_centroids), not the
    oracle-reproducible head seed — measured with the same ann_recall
    row shape and held to the same floor. k-means isn't SQL-expressible,
    so this is the property-gated sibling of the hash-gated `ann_recall`
    entry (same floor constant, same recall@10 metric)."""
    from logspark.queries import ANN_RECALL_FLOOR

    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, query_id=0, k=10).collect()}
    trained = similarity.train_ivf_centroids(emb, k=6)
    approx = {
        r["vec_id"]
        for r in similarity.ivf_topk(
            emb, query_id=0, nprobe=2, k=10, centroids=trained
        ).collect()
    }
    recall = len(exact & approx) / 10.0
    row = {
        "method": "ivf_trained",
        "recall_at_10": round(recall, 6),
        "is_default": False,
        "meets_floor": recall >= ANN_RECALL_FLOOR,
    }
    assert row["meets_floor"], row
    # determinism: retraining yields identical centroids (no RNG anywhere)
    again = similarity.train_ivf_centroids(emb, k=6)
    a = sorted(map(tuple, trained.select("cell", "cvec").collect()))
    b = sorted(map(tuple, again.select("cell", "cvec").collect()))
    assert [(c, tuple(v)) for c, v in a] == [(c, tuple(v)) for c, v in b]


def test_cosine_topk_batch_equals_per_query(spark, emb):
    """Batch multi-query top-k == per-query cosine_topk for every query:
    same neighbor ids in the same order, sims within rounding ulp; missing
    query ids fail loudly."""
    qids = [0, 7, 42]
    batch = similarity.cosine_topk_batch(emb, qids, k=8)
    per_q: dict = {}
    for r in batch.collect():
        per_q.setdefault(r["query_id"], []).append((r["vec_id"], r["sim"]))
    assert set(per_q) == set(qids)
    for qid in qids:
        got = per_q[qid]  # window already ordered (sim desc, id asc)
        got.sort(key=lambda t: (-t[1], t[0]))
        exact = [
            (r["vec_id"], r["sim"])
            for r in similarity.cosine_topk(emb, qid, k=8).collect()
        ]
        assert [g[0] for g in got] == [e[0] for e in exact], qid
        for (gid, gs), (eid, es) in zip(got, exact):
            assert gs == pytest.approx(es, abs=2e-6)
    with pytest.raises(ValueError, match="none of"):
        similarity.cosine_topk_batch(emb, [10**9], k=3)


def test_round_half_up6_matches_spark_round(spark):
    """round_half_up6 is bit-identical to F.round(col, 6) on doubles —
    including the half-even-vs-half-up boundary cases where Python's
    builtin round() diverges (ADVICE r4: the streaming IVF path must
    round exactly like the batch F.round it mirrors)."""
    import random

    from pyspark.sql import functions as F

    from logspark.functions.rounding import round_half_up6

    rng = random.Random(7)
    vals = [0.9999995, -0.9999995, 0.1234565, 0.1234575, 0.5e-6, -0.5e-6, 1.0, 0.0]
    vals += [rng.uniform(-1, 1) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r["x"]: r["r"] for r in df.select("x", F.round("x", 6).alias("r")).collect()}
    for v in vals:
        assert round_half_up6(v) == got[v], v
    # and the builtin does NOT match on a half boundary (sanity that the
    # helper is actually needed)
    assert round(0.1234565, 6) != round_half_up6(0.1234565)


def test_pack_sequences_div_exact_past_2_53(spark):
    """The closed-form sequence boundaries use integer `div`, not double
    division — at offsets past 2^53 the old `/`+cast form misrounds
    (ADVICE r4). Check the expression directly at huge offsets."""
    from pyspark.sql import functions as F

    L = 2048
    starts = [2**53 + 1, 2**53 + 3, 2**60 + 12345, 2**62 - 7]
    df = spark.createDataFrame([(s, 100) for s in starts], "_start long, n_toks long")
    rows = df.select(
        "_start",
        F.expr(f"_start div {L}").alias("first"),
        F.expr(f"(_start + n_toks - 1) div {L}").alias("last"),
        (F.col("_start") / F.lit(L).cast("long")).cast("long").alias("first_float"),
    ).collect()
    for r in rows:
        assert r["first"] == r["_start"] // L
        assert r["last"] == (r["_start"] + 99) // L
    # the double-division form really does misround up there
    assert any(r["first_float"] != r["first"] for r in rows)


def test_pack_sequences_invariants(spark):
    """Concatenate-and-cut packing: every sequence except the last holds
    exactly seq_tokens tokens; each doc's slices are contiguous, start at
    0, and sum to its token count; straddling docs span adjacent
    sequences; the result equals a straightforward driver-side packing
    of the same ordered stream."""
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([5, 17, 3, 64, 1, 30, 9, 128, 2, 40])]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    L = 32
    out = textops.pack_sequences(docs, seq_tokens=L, num_buckets=3).collect()
    per_seq: dict = {}
    per_doc: dict = {}
    for r in out:
        per_seq[r["seq_idx"]] = per_seq.get(r["seq_idx"], 0) + r["n_toks_in_seq"]
        per_doc.setdefault(r["doc_id"], []).append(r)
    total = sum(n for _, n in [(i, len(t.split())) for i, t in rows])
    assert sum(per_seq.values()) == total
    last = max(per_seq)
    assert set(per_seq) == set(range(last + 1))  # contiguous sequence ids
    for s, n in per_seq.items():
        assert n == L if s < last else 0 < n <= L, (s, n)
    n_by_doc = {i: len(t.split()) for i, t in rows}
    for d, slices in per_doc.items():
        slices.sort(key=lambda r: r["seq_idx"])
        assert [r["seq_idx"] for r in slices] == list(
            range(slices[0]["seq_idx"], slices[-1]["seq_idx"] + 1)
        )
        assert slices[0]["doc_tok_start"] == 0
        assert sum(r["n_toks_in_seq"] for r in slices) == n_by_doc[d]
        # slice starts chain: next start = prev start + prev length
        acc = 0
        for r in slices:
            assert r["doc_tok_start"] == acc
            acc += r["n_toks_in_seq"]
    # driver-side reference packing agrees on every (seq, doc) cell
    ref: dict = {}
    off = 0
    for i, t in rows:
        n = len(t.split())
        for s in range(off // L, (off + n - 1) // L + 1):
            ref[(s, i)] = min((s + 1) * L, off + n) - max(s * L, off)
        off += n
    got = {(r["seq_idx"], r["doc_id"]): r["n_toks_in_seq"] for r in out}
    assert got == ref
    with pytest.raises(ValueError, match="seq_tokens"):
        textops.pack_sequences(docs, seq_tokens=0)


def test_conversation_examples_assembly(spark):
    """SFT example assembly: one example per assistant turn with prior
    context, context = last k prior turns as 'role: text' lines in turn
    order, no empty-context examples, conversations independent."""
    rows = [
        ("c1", 0, "user", "hi"),
        ("c1", 1, "assistant", "hello"),
        ("c1", 2, "user", "how are you"),
        ("c1", 3, "tool", "lookup ok"),
        ("c1", 4, "assistant", "fine thanks"),
        ("c2", 0, "assistant", "orphan greeting"),   # no prior context -> dropped
        ("c2", 1, "user", "q"),
        ("c2", 2, "assistant", "a"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    from logspark.operators.aggregates import conversation_examples

    got = {
        (r["conv_id"], r["turn_idx"]): r
        for r in conversation_examples(df, max_context_turns=2).collect()
    }
    assert set(got) == {("c1", 1), ("c1", 4), ("c2", 2)}
    assert got[("c1", 1)]["context"] == "user: hi"
    assert got[("c1", 1)]["target"] == "hello"
    # last-2 window: turns 2,3 only (turn 1 aged out)
    assert got[("c1", 4)]["context"] == "user: how are you\ntool: lookup ok"
    # prior turns of ANY role are context, including earlier assistant turns
    assert got[("c2", 2)]["context"] == "assistant: orphan greeting\nuser: q"
    # wider window keeps everything
    full = {
        (r["conv_id"], r["turn_idx"]): r["context"]
        for r in conversation_examples(df, max_context_turns=10).collect()
    }
    assert full[("c1", 4)] == "user: hi\nassistant: hello\nuser: how are you\ntool: lookup ok"


def test_conversation_examples_token_budget(spark):
    """max_context_tokens drops whole turns from the OLDEST side until the
    contiguous suffix fits; a lone over-budget newest turn empties the
    context (example dropped); no turn is ever split."""
    rows = [
        ("c1", 0, "user", "one two three four five"),        # 5+1 rendered tokens
        ("c1", 1, "tool", "a b"),                            # 2+1
        ("c1", 2, "user", "x"),                              # 1+1
        ("c1", 3, "assistant", "answer"),
        ("c2", 0, "user", " ".join(["w"] * 50)),             # huge single turn
        ("c2", 1, "assistant", "a"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    from logspark.operators.aggregates import conversation_examples

    # budget 6: keeps turns 1 (3 toks: 'tool: a b') + 2 (2 toks: 'user: x'),
    # turn 0 (6 toks) does not fit on top
    got = {
        (r["conv_id"], r["turn_idx"]): r["context"]
        for r in conversation_examples(
            df, max_context_turns=8, max_context_tokens=6
        ).collect()
    }
    assert got[("c1", 3)] == "tool: a b\nuser: x"
    assert ("c2", 1) not in got  # 51-token turn over budget -> empty ctx -> dropped
    # generous budget keeps everything
    full = {
        (r["conv_id"], r["turn_idx"]): r["context"]
        for r in conversation_examples(
            df, max_context_turns=8, max_context_tokens=1000
        ).collect()
    }
    assert full[("c1", 3)] == "user: one two three four five\ntool: a b\nuser: x"
    assert full[("c2", 1)].startswith("user: w w")
    # suffix property: once a turn is dropped, everything older is too —
    # budget 9 fits turns 1+2 (5) but NOT 0 (6 more): still just 1+2
    mid = {
        (r["conv_id"], r["turn_idx"]): r["context"]
        for r in conversation_examples(
            df, max_context_turns=8, max_context_tokens=9
        ).collect()
    }
    assert mid[("c1", 3)] == "tool: a b\nuser: x"


def test_train_eval_split_deterministic_and_stratified(spark, docs):
    """Hash-based holdout: membership is a pure function of (salt, id) —
    stable under corpus growth, re-runs, and partitioning; observed
    fractions track the requested ones; per-stratum fractions honored;
    a different salt yields an independent split."""
    from logspark.operators.textops import train_eval_split

    out = train_eval_split(docs, eval_fraction=0.1)
    rows = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    n = len(rows)
    n_eval = sum(1 for v in rows.values() if v == "eval")
    assert 0.04 <= n_eval / n <= 0.2  # small corpus: generous tolerance
    # re-run: identical membership
    again = {r["doc_id"]: r["split"]
             for r in train_eval_split(docs, eval_fraction=0.1).select("doc_id", "split").collect()}
    assert again == rows
    # growth stability: the split over HALF the corpus agrees on shared ids
    ids = sorted(rows)
    half = docs.filter(F.col("doc_id").isin(ids[: n // 2]))
    sub = {r["doc_id"]: r["split"]
           for r in train_eval_split(half, eval_fraction=0.1).select("doc_id", "split").collect()}
    assert all(rows[d] == s for d, s in sub.items())
    # independent split under a new salt (some membership changes)
    other = {r["doc_id"]: r["split"]
             for r in train_eval_split(docs, eval_fraction=0.1, salt="v2").select("doc_id", "split").collect()}
    assert other != rows
    # stratified: hold out ~30% of 'en', ~0% of everything else
    st = train_eval_split(docs, eval_fraction=0.0, strata_col="lang",
                          fractions={"en": 0.3}).groupBy("lang", "split").count().collect()
    per = {(r["lang"], r["split"]): r["count"] for r in st}
    en_total = per.get(("en", "eval"), 0) + per.get(("en", "train"), 0)
    assert per.get(("en", "eval"), 0) / max(en_total, 1) > 0.15
    assert not any(s == "eval" and l != "en" for (l, s) in per)
    with pytest.raises(ValueError, match="eval_fraction"):
        train_eval_split(docs, eval_fraction=1.5)


def test_sft_batches_composition(spark):
    """sft_batches = conversation_examples ∘ pack_sequences_nosplit: every
    example packs whole into a batch in (conv_id, turn_idx) order, batch
    fills never exceed seq_tokens, and the batch assignment equals the
    sequential reference packer run over the collected examples."""
    from logspark.operators.aggregates import conversation_examples
    from logspark.operators.textops import sft_batches

    rows = []
    for c in range(6):
        conv = f"c{c}"
        for t in range(12):
            role = "assistant" if t % 2 == 1 else "user"
            rows.append((conv, t, role, f"{conv} turn {t} " + " ".join(["w"] * (3 + (t * 7 + c) % 9))))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    L = 64
    got_rows = sft_batches(df, seq_tokens=L, max_context_turns=4).collect()
    got = {(r["conv_id"], r["turn_idx"]): r["seq_idx"] for r in got_rows}

    ex = conversation_examples(df, max_context_turns=4).collect()
    ex.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    sizes = [
        ((r["conv_id"], r["turn_idx"]), len((r["context"] + "\n" + r["target"]).split(" ")))
        for r in ex
    ]
    ref = _reference_nosplit_pack(sizes, L)
    assert got == ref and got
    fills: dict = {}
    for r in got_rows:
        fills[r["seq_idx"]] = fills.get(r["seq_idx"], 0) + r["n_toks"]
    assert all(v <= L for v in fills.values())
    # partition-invariant like the underlying packer
    got2 = {
        (r["conv_id"], r["turn_idx"]): r["seq_idx"]
        for r in sft_batches(df, seq_tokens=L, max_context_turns=4, num_buckets=3).collect()
    }
    assert got2 == got


def _reference_nosplit_pack(sizes_by_id: list, L: int):
    """Sequential greedy first-fit-in-order packer: the semantics
    pack_sequences_nosplit must reproduce for any bucket count."""
    out, bin_id, fill = {}, -1, None
    for i, n in sizes_by_id:
        if n <= 0 or n > L:
            continue
        if fill is None or fill + n > L:
            bin_id += 1
            fill = 0
        out[i] = bin_id
        fill += n
    return out


def test_pack_sequences_nosplit_matches_sequential_reference(spark):
    """VERDICT r4 #6 / SURVEY §9.4: no-split first-fit packing equals the
    sequential reference packer bit-for-bit, for several bucket counts
    (partition-invariance is the whole point of the reconciliation) and
    several size mixes; invariants: no doc split, no bin over capacity,
    over-long docs dropped, bin ids dense in opening order."""
    import random

    from logspark.operators.textops import pack_sequences_nosplit

    rng = random.Random(31)
    cases = [
        ("uniform", [rng.randint(1, 30) for _ in range(400)], 64),
        ("big-and-small", [rng.choice([1, 2, 3, 60, 61]) for _ in range(300)], 64),
        ("exact-fits", [32] * 100, 64),
        ("with-overlong", [rng.randint(1, 120) for _ in range(200)], 64),
        ("tiny", [5, 10], 64),
    ]
    for name, sizes, L in cases:
        rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        ref = _reference_nosplit_pack(list(enumerate(sizes)), L)
        for P in (1, 3, 8):
            got_rows = pack_sequences_nosplit(docs, seq_tokens=L, num_buckets=P).collect()
            got = {r["doc_id"]: r["seq_idx"] for r in got_rows}
            assert got == ref, (name, P)
            per_bin: dict = {}
            for r in got_rows:
                assert r["n_toks"] == sizes[r["doc_id"]]  # no doc split
                per_bin[r["seq_idx"]] = per_bin.get(r["seq_idx"], 0) + r["n_toks"]
            assert all(v <= L for v in per_bin.values()), (name, P)
            if per_bin:
                assert set(per_bin) == set(range(max(per_bin) + 1)), (name, P)  # dense
    with pytest.raises(ValueError, match="seq_tokens"):
        pack_sequences_nosplit(spark.createDataFrame([(1, "a")], "doc_id bigint, text string"), 0)


def test_sft_batches_shuffle_count(spark):
    """Plan audit: the sft composition's FINAL assignment plan carries
    exactly the shuffles it needs — one hash exchange for the per-
    conversation examples window and one range exchange for the packer's
    bucketing — so a regression that adds a join or an extra
    repartition to the hot path fails loudly."""
    from logspark.operators.textops import sft_batches

    rows = [("c1", t, "assistant" if t % 2 else "user", "some words here")
            for t in range(6)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    plan = sft_batches(df, seq_tokens=64)._jdf.queryExecution().executedPlan().toString()
    import re

    n_exchanges = len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
    # window shuffle is upstream of the packer's localCheckpoint, so the
    # final plan shows only the checkpoint scan -> groupBy(_bkt) exchange
    assert n_exchanges <= 2, plan
    assert "Join" not in plan  # key recovery is slicing, never a join


def test_pack_sequences_nosplit_hypothesis(spark):
    """Property form of the no-split guarantee: for random size lists,
    capacities, and bucket counts drawn by hypothesis, the distributed
    packer equals the sequential reference packer exactly — including
    the carried-bin reconciliation cases the fixed-case test can miss
    (bins spanning several buckets, empty buckets, exact fills)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from logspark.operators.textops import pack_sequences_nosplit

    @given(
        st.lists(st.integers(1, 40), min_size=1, max_size=120),
        st.integers(8, 64),
        st.integers(1, 7),
    )
    @settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    def check(sizes, L, P):
        rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            r["doc_id"]: r["seq_idx"]
            for r in pack_sequences_nosplit(docs, seq_tokens=L, num_buckets=P).collect()
        }
        assert got == _reference_nosplit_pack(list(enumerate(sizes)), L)

    check()


def test_conversation_examples_long_conversation_linear(spark):
    """VERDICT r4 #1: context is collected over the BOUNDED frame
    rowsBetween(-k, -1), so one 50k-turn conversation is O(T·k), not
    O(T²) — it must finish in seconds. Also checks a deep example's
    context is exactly the last k prior turns."""
    import time

    from logspark.operators.aggregates import conversation_examples

    T = 50_000
    rows = [
        ("long", i, "user" if i % 2 == 0 else "assistant", f"turn {i} words here")
        for i in range(T)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string").coalesce(4)
    t0 = time.monotonic()
    out = conversation_examples(df, max_context_turns=8)
    n = out.count()
    deep = out.filter(F.col("turn_idx") == T - 1).collect()[0]
    wall = time.monotonic() - t0
    assert n == T // 2  # every assistant turn has prior context
    assert deep["context"].splitlines() == [
        f"{'user' if i % 2 == 0 else 'assistant'}: turn {i} words here"
        for i in range(T - 9, T - 1)
    ]
    assert deep["target"] == f"turn {T - 1} words here"
    # generous bound: the O(T^2) form takes minutes on 50k turns
    assert wall < 60, f"conversation_examples took {wall:.1f}s on a {T}-turn conversation"
