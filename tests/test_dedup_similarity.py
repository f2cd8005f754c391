from pyspark.sql import Row

from document_parsing_etl_pipeline_spark.operators import dedup, similarity


def _docs(spark, *texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_exact_dedup_groups_identical_content(spark):
    df = _docs(spark, "Hello  World", "hello world", "different text")
    rows = dedup.dedup_exact(df).collect()
    groups = {r.content_hash: r for r in rows}
    assert len(groups) == 2  # normalization folds the first two
    dup = [g for g in groups.values() if g.n_docs == 2][0]
    assert dup.canonical_doc_id == 0


def test_minhash_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = _docs(spark, base, base + " extra", "zz yy xx ww vv uu tt ss")
    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert {(p.doc_a, p.doc_b) for p in pairs} == {(0, 1)}
    assert pairs[0].jaccard > 0.8


def test_simhash_identical_docs_zero_hamming(spark):
    df = _docs(spark, "alpha beta gamma delta", "alpha beta gamma delta",
               "completely unrelated words here")
    pairs = dedup.simhash_pairs(df, max_hamming=0).collect()
    assert {(p.doc_a, p.doc_b) for p in pairs} == {(0, 1)}


def _emb(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v], label=0)
         for i, v in enumerate(vecs)]
    )


def test_embedding_near_dup(spark):
    df = _emb(spark, [[1, 0, 0], [0.99, 0.01, 0], [0, 1, 0]])
    pairs = dedup.embedding_near_dup(df, threshold=0.95).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(0, 1)}


def test_knn_brute_ranks_by_cosine(spark):
    df = _emb(spark, [[1, 0], [0.9, 0.1], [0, 1], [-1, 0]])
    rows = similarity.knn_brute_cosine(df, num_queries=1, k=3).collect()
    assert [r.vec_id for r in sorted(rows, key=lambda r: r.rank)] == [1, 2, 3]


def test_ivf_bucket_restricts_candidates(spark):
    # query [1,0,...] shares a sign bucket with [0.9,...] but not [-1,...]
    df = _emb(spark, [[1, 0.1, 0.1, 0.1], [0.9, 0.2, 0.1, 0.1],
                      [-1, 0.1, 0.1, 0.1]])
    rows = similarity.knn_ivf_bucketed(df, num_queries=1, k=5).collect()
    assert {r.vec_id for r in rows} == {1}


def test_ivf_probe_finds_cross_list_neighbors(spark):
    # probe-IVF with nprobe > 1 reaches neighbors assigned to a
    # DIFFERENT (second-nearest) posting list — exactly what the
    # single-bucket sign variant misses
    import random
    random.seed(11)
    vecs = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(60)]
    df = _emb(spark, vecs)
    exact = {
        (r.query_id, r.vec_id, r.rank)
        for r in similarity.knn_brute_cosine(df, num_queries=3, k=3).collect()
    }
    probe_all = {
        (r.query_id, r.vec_id, r.rank)
        for r in similarity.knn_ivf_probe(
            df, num_queries=3, k=3, num_centroids=4, nprobe=4
        ).collect()
    }
    # nprobe == num_centroids scans every list → must equal brute force
    assert probe_all == exact


def test_knn_all_topk_multiblock_matches_single_block(spark):
    import random
    random.seed(7)
    vecs = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(40)]
    df = _emb(spark, vecs)
    one = similarity.knn_all_topk(df, k=3, block_size=64)
    many = similarity.knn_all_topk(df, k=3, block_size=8)  # 5 blocks
    a = sorted(map(tuple, one.collect()))
    b = sorted(map(tuple, many.collect()))
    assert a == b and len(a) == 40 * 3


def test_embedding_near_dup_multiblock(spark):
    df = _emb(spark, [[1, 0], [0.999, 0.01], [0, 1], [0.998, 0.02]])
    pairs = dedup.embedding_near_dup(df, threshold=0.99, block_size=2)
    got = {(p.id_a, p.id_b) for p in pairs.collect()}
    assert got == {(0, 1), (0, 3), (1, 3)}  # cross-block pair (0,3) found


def test_connected_components(spark):
    from pyspark.sql import Row as R
    pairs = spark.createDataFrame(
        [R(doc_a=1, doc_b=2), R(doc_a=2, doc_b=3), R(doc_a=5, doc_b=6),
         R(doc_a=3, doc_b=4)]  # chain 1-2-3-4 and pair 5-6
    )
    got = {r.doc_id: r.component_id
           for r in dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}


def test_connected_components_star_matches_propagation(spark):
    import random
    from pyspark.sql import Row as R
    rng = random.Random(7)
    # random graph: 40 vertices, 35 edges → several components,
    # including a long chain to stress the star rounds
    edges = [(i, i + 1) for i in range(0, 10)]  # chain 0..10
    edges += [(rng.randrange(11, 40), rng.randrange(11, 40))
              for _ in range(25)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame([R(doc_a=a, doc_b=b) for a, b in edges])
    prop = {r.doc_id: r.component_id
            for r in dedup.connected_components(pairs, max_iter=50).collect()}
    star = {r.doc_id: r.component_id
            for r in dedup.connected_components_star(pairs).collect()}
    assert star == prop


def test_blank_and_whitespace_docs_drop_from_signatures(spark):
    """Zero-token docs (empty/whitespace) must not pair with each
    other: they have no signature rows (explode drops them), matching
    the oracle-side len(tokens) > 0 filter."""
    from pyspark.sql import Row as R
    docs = spark.createDataFrame([
        R(doc_id=1, text=""), R(doc_id=2, text="   \t  "),
        R(doc_id=3, text="real words here"),
        R(doc_id=4, text="real words here"),
    ])
    sh = dedup.simhash_pairs(docs, max_hamming=3)
    pairs = {(r.doc_a, r.doc_b) for r in sh.collect()}
    assert (1, 2) not in pairs
    assert (3, 4) in pairs
    mh = dedup.minhash_lsh_candidates(docs)
    mpairs = {(r.doc_a, r.doc_b) for r in mh.collect()}
    assert (1, 2) not in mpairs and (3, 4) in mpairs


def test_edit_distance_pairs_on_lsh_candidates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = _docs(spark, base, base.replace("dog", "cat"),
               "zz yy xx ww vv uu tt ss")
    pairs = dedup.edit_distance_pairs(df, max_dist=20).collect()
    assert {(p.doc_a, p.doc_b) for p in pairs} == {(0, 1)}
    assert pairs[0].edit_dist == 3  # dog -> cat: 3 substitutions


def test_incremental_dedup_flags_only_corpus_matches(spark):
    corpus = _docs(spark,
                   "alpha beta gamma delta epsilon zeta",
                   "one two three four five six")
    # batch: doc 0 duplicates corpus doc 0; doc 1 is novel; doc 2
    # duplicates BATCH doc 1 but nothing in the corpus — must NOT flag
    # (incremental dedup is vs the standing corpus only)
    batch = spark.createDataFrame([
        Row(doc_id=10, text="alpha beta gamma delta epsilon zeta"),
        Row(doc_id=11, text="seven eight nine ten eleven twelve"),
        Row(doc_id=12, text="seven eight nine ten eleven twelve"),
    ])
    out = {r.doc_id: r for r in
           dedup.incremental_lsh_matches(batch, corpus).collect()}
    assert len(out) == 3
    assert out[10].is_dup and out[10].first_match_doc == 0
    assert not out[11].is_dup and out[11].first_match_doc == -1
    assert not out[12].is_dup  # batch-internal dup is not a corpus dup


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    base = ("alpha bravo charlie delta echo foxtrot golf hotel "
            "india juliet kilo lima")
    wrapper = base + " mike november oscar papa"  # base ⊂ wrapper, J=12/16
    df = _docs(spark, base, wrapper, "uu vv ww xx yy zz")
    # band_size=1 → per-band collision prob = J: recall ~1-(1-J)^8 for
    # the test (the default banding trades recall for precision)
    got = {(r.doc_a, r.doc_b): r
           for r in dedup.containment_pairs(
               df, band_size=1, threshold=0.9
           ).collect()}
    assert (0, 1) in got
    r = got[(0, 1)]
    assert r.cont_a_in_b == 1.0          # base fully inside wrapper
    assert r.cont_b_in_a < 0.9           # wrapper not inside base
    # the symmetric jaccard pipeline at the same bar misses this pair
    jac = {(p.doc_a, p.doc_b)
           for p in dedup.ngram_jaccard_pairs(df, threshold=0.9).collect()}
    assert (0, 1) not in jac


def test_sparse_sim_ranks_by_shared_rare_shingles(spark):
    from document_parsing_etl_pipeline_spark.operators.corpus import (
        sparse_sim_topk,
    )

    phrase = "quantum flux capacitor alignment protocol"
    df = _docs(
        spark,
        f"intro text {phrase} closing words here",
        f"other document reusing {phrase} differently now",
        "entirely unrelated content about cooking pasta tonight ok",
        "more unrelated material discussing garden furniture today yes",
    )
    out = {(r.doc_id, r.rank): r.neighbor_id
           for r in sparse_sim_topk(df, df_min=2, df_max=4, k=1).collect()}
    # the two phrase-sharing docs are each other's top neighbor
    assert out.get((0, 1)) == 1
    assert out.get((1, 1)) == 0


def test_span_dedup_profile_marks_shared_spans(spark):
    from document_parsing_etl_pipeline_spark.operators.dedup import (
        span_dedup_profile,
    )
    shared = " ".join(f"w{i}" for i in range(12))  # one exact 12-gram
    docs = spark.createDataFrame(
        [
            (0, shared + " tail0 tail1 tail2"),
            (1, "head0 head1 " + shared),
            (2, " ".join(f"u{i}" for i in range(20))),  # unique
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in span_dedup_profile(docs, k=12).collect()}
    # doc0: 4 windows, only window 1 (the shared span) duplicated
    assert rows[0].n_windows == 4 and rows[0].n_dup_windows == 1
    assert rows[0].covered_tokens == 12
    assert rows[0].dup_coverage_ppm == 1_000_000 * 12 // 15
    # doc1: shared span starts at token 3 of 14
    assert rows[1].n_dup_windows == 1 and rows[1].covered_tokens == 12
    # unique doc: nothing flagged
    assert rows[2].n_dup_windows == 0 and rows[2].covered_tokens == 0
    assert rows[2].dup_coverage_ppm == 0


def test_span_dedup_overlapping_windows_union_coverage(spark):
    from document_parsing_etl_pipeline_spark.operators.dedup import (
        span_dedup_profile,
    )
    # doc0 repeated verbatim -> every window duplicated, full coverage
    t = " ".join(f"x{i}" for i in range(16))
    docs = spark.createDataFrame(
        [(0, t), (1, t)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in span_dedup_profile(docs, k=12).collect()}
    for r in rows.values():
        assert r.n_dup_windows == r.n_windows == 5
        # overlapping dup windows union to the whole doc, not 5*12
        assert r.covered_tokens == 16
        assert r.dup_coverage_ppm == 1_000_000


def test_pagerank_integer_matches_reference_recurrence(spark):
    from document_parsing_etl_pipeline_spark.operators.graph import (
        pagerank_integer, PPM,
    )
    # star: hub <-> 3 spokes, plus a chain tail  (directed both ways)
    und = [("hub", "s1"), ("hub", "s2"), ("hub", "s3"), ("s1", "t1")]
    pairs = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    got = {
        r.ent: (r.degree, r.pagerank_micro)
        for r in pagerank_integer(edges, iterations=3).collect()
    }
    # python replay of the exact integer recurrence
    damp, base = 850_000, 150_000
    out = {u: [v for (a, v) in pairs if a == u] for u, _ in pairs}
    deg = {u: len(vs) for u, vs in out.items()}
    r = {u: PPM for u in deg}
    for _ in range(3):
        nxt = {u: base for u in deg}
        for u, vs in out.items():
            c = (r[u] * damp) // (PPM * deg[u])
            for v in vs:
                nxt[v] += c
        r = nxt
    assert {u: (deg[u], r[u]) for u in r} == got
    # hub outranks spokes, spokes outrank the tail
    assert got["hub"][1] > got["s1"][1] > got["t1"][1]


def test_setsim_prefix_join_matches_brute_force(spark):
    # 8 docs: two clone clusters + unrelated text; brute-force exact
    # Jaccard over shingle sets is the ground truth the lossless
    # prefix filter must reproduce bit-for-bit.
    texts = [
        "a b c d e f g h i j",          # 0
        "a b c d e f g h i k",          # 1 near-dup of 0
        "a b c d e f g h i j",          # 2 exact dup of 0
        "p q r s t u v w x y",          # 3
        "p q r s t u v w x z",          # 4 near-dup of 3
        "m n o aa bb cc dd ee ff gg",   # 5 unrelated
        "one two three",                # 6 tiny
        "one two three",                # 7 tiny exact dup
    ]
    df = _docs(spark, *texts)
    got = {
        (r.doc_a, r.doc_b): (r.inter_size, r.union_size, r.jaccard_ppm)
        for r in dedup.setsim_prefix_join(df).collect()
    }

    # brute force in python over the same 3-gram shingle sets
    def sh(t):
        ws = t.lower().split()
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    want = {}
    sets = [sh(t) for t in texts]
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter * 5 >= union * 3:
                want[(a, b)] = (inter, union, inter * 1_000_000 // union)
    assert want, "fixture must produce at least one qualifying pair"
    assert got == want


def test_setsim_prefix_candidates_are_pruned(spark):
    # The prefix join must NOT materialize the full pair product:
    # with a shared boilerplate shingle across every doc, brute force
    # pairs everything, the rarest-first prefix pairs almost nothing.
    boiler = "common shared boilerplate header text "
    texts = [boiler + f"unique{i} tail{i} body{i} word{i}" for i in range(12)]
    df = _docs(spark, *texts)
    # no pair reaches jaccard 0.6 (boilerplate overlap is small
    # relative to union), so the exact join returns empty
    assert dedup.setsim_prefix_join(df).count() == 0


def test_triangle_counts_by_brute_force(spark):
    from itertools import combinations

    from document_parsing_etl_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    # K4 on {0,1,2,3} (4 triangles), pendant node 9 attached to 0,
    # a disjoint triangle {5,6,7}, and an isolated edge 10-11.
    pairs = (
        list(combinations([0, 1, 2, 3], 2))
        + [(0, 9), (5, 6), (6, 7), (5, 7), (10, 11)]
    )
    edges = spark.createDataFrame(pairs, ["a", "b"])
    got = {
        r.node: (r.degree, r.n_triangles)
        for r in triangle_counts(edges).collect()
    }
    # brute force
    import collections
    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b); adj[b].add(a)
    want = {}
    nodes = sorted(adj)
    tri = [
        (x, y, z)
        for x, y, z in combinations(nodes, 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    ]
    for n in nodes:
        want[n] = (
            len(adj[n]),
            sum(1 for t in tri if n in t),
        )
    assert got == want
    # K4 nodes sit in 3 triangles each; pendant and isolated-edge in 0
    assert got[0] == (4, 3) and got[9] == (1, 0) and got[10] == (1, 0)


def test_incremental_components_merges_standing_components(spark):
    """The hard incremental case: a batch document bridges TWO
    existing standing components — the contracted graph must merge
    them and every member must relabel to the global minimum."""
    from pyspark.sql import Row

    from document_parsing_etl_pipeline_spark.operators import dedup

    # standing comps {1,2} and {10,11}; batch doc 20 similar to 2 and
    # 10; batch doc 25 isolated-similar to nothing; batch pair (20,21)
    standing_pairs = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=10, doc_b=11)]
    )
    batch_pairs = spark.createDataFrame(
        [Row(doc_a=2, doc_b=20), Row(doc_a=10, doc_b=20),
         Row(doc_a=20, doc_b=21)]
    )
    out = {
        r.doc_id: r.component_id
        for r in dedup.incremental_components(
            standing_pairs, batch_pairs
        ).collect()
    }
    # everything reachable through doc 20 collapses to min id 1
    assert out == {1: 1, 2: 1, 10: 1, 11: 1, 20: 1, 21: 1}


def test_setsim_incremental_union_equals_from_scratch(spark):
    """standing-pairs ∪ incremental batch pairs must equal the
    from-scratch all-pairs join exactly (the losslessness of the
    prefix/positional filters is order-independent)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from document_parsing_etl_pipeline_spark.operators import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = {
        0: base,
        1: base + " extra",
        2: base.replace("gamma", "lambda"),
        3: "totally different words nothing shared here at all ok",
        4: base,                      # batch: exact dup of 0
        5: base + " extra tail",      # batch: near 1
        9: "unrelated content again completely disjoint tokens yes",
    }
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()]
    )
    flagged = docs.withColumn("is_batch", F.expr("doc_id >= 4"))
    full = {
        (r.doc_a, r.doc_b, r.jaccard_ppm)
        for r in dedup.setsim_prefix_join(docs).collect()
    }
    standing = {
        (r.doc_a, r.doc_b, r.jaccard_ppm)
        for r in dedup.setsim_prefix_join(
            flagged.where("NOT is_batch")
        ).collect()
    }
    batch = {
        (r.doc_a, r.doc_b, r.jaccard_ppm)
        for r in dedup.setsim_incremental_pairs(
            flagged, batch_col="is_batch"
        ).collect()
    }
    assert standing | batch == full
    assert standing & batch == set()  # no pair produced twice


def test_setsim_suffix_filter_is_lossless_for_any_bucket_count(spark):
    """Round 7 (PPJoin+ suffix filter): the vectorized suffix filter
    (_suffix_histogram_filter) is a pure candidate cut — the final
    pair relation must be IDENTICAL with the filter off, at the
    default 128 buckets, and at an aliasing-heavy 4 buckets (hash
    collisions only weaken the bound upward, never below the true
    overlap). Randomized near/far pairs straddle the 0.6 threshold."""
    import random

    rng = random.Random(73)
    vocab = [f"w{i}" for i in range(400)]
    texts = []
    # base docs + mutated copies at varying edit fractions so some
    # pairs land just above and some just below threshold
    for _ in range(10):
        base = [rng.choice(vocab) for _ in range(30)]
        texts.append(" ".join(base))
        for frac in (0.05, 0.2, 0.5):
            mut = list(base)
            for _ in range(max(1, int(len(mut) * frac))):
                mut[rng.randrange(len(mut))] = rng.choice(vocab)
            texts.append(" ".join(mut))
    df = _docs(spark, *texts)

    def pairs(**kw):
        return {
            (r.doc_a, r.doc_b): (r.inter_size, r.union_size)
            for r in dedup.setsim_prefix_join(df, **kw).collect()
        }

    base = pairs(suffix_buckets=None)
    assert base, "fixture must produce qualifying pairs"
    assert pairs(suffix_buckets=128) == base
    assert pairs(suffix_buckets=4) == base


def test_artifact_tables_survive_session_restart(spark, tmp_path, monkeypatch):
    """With SPARK_GRAFT_ARTIFACTS set, the standing dedup artifacts
    (pairs, components, setsim index) materialize as table-format
    snapshot tables: the first call commits them, a 'restarted'
    session (cleared in-memory memo) READS the committed snapshot
    instead of recomputing — no new manifest versions — and every
    consumer query returns identical rows in both modes (round-8
    verdict item: execute the deployment story, don't just document
    it)."""
    import os

    from document_parsing_etl_pipeline_spark.plans import queries as Q
    from document_parsing_etl_pipeline_spark.sources import (
        artifacts, tableformat as tf,
    )

    sf = "/root/testdata/sf0.001"

    def rows(df):
        return sorted(map(tuple, df.collect()))

    # reference results from the default (memo) mode
    Q._NEARDUP_MEMO.clear()
    want_inc = rows(Q.QUERIES["q_incremental_components"](spark, sf))
    want_comp = rows(Q.QUERIES["dedup_components"](spark, sf))

    store = str(tmp_path / "artifacts")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", store)
    Q._NEARDUP_MEMO.clear()
    got_inc = rows(Q.QUERIES["q_incremental_components"](spark, sf))
    got_comp = rows(Q.QUERIES["dedup_components"](spark, sf))
    assert got_inc == want_inc and got_comp == want_comp

    names = ["setsim_pairs", "setsim_components", "setsim_index_sh",
             "setsim_index_pref", "neardup_pairs", "neardup_components",
             "minhash_sigs",  # round 10: the pairs build consumes it
             "neardup_verified"]  # round 12: pairs = filter(verified)
    roots = {n: artifacts.table_root(store, sf, n) for n in names}
    vers = {n: tf._versions(r) for n, r in roots.items()}
    assert all(v == [1] for v in vers.values()), vers

    # "session restart": drop the in-memory memo; the artifact tables
    # must be READ (version count unchanged), results identical
    Q._NEARDUP_MEMO.clear()
    again_inc = rows(Q.QUERIES["q_incremental_components"](spark, sf))
    again_comp = rows(Q.QUERIES["dedup_components"](spark, sf))
    assert again_inc == want_inc and again_comp == want_comp
    assert {n: tf._versions(r) for n, r in roots.items()} == vers

    # the artifact is a real table: snapshot maintenance applies
    tf.optimize_table(spark, roots["neardup_components"],
                      target_file_rows=1_000_000)
    tf.expire_snapshots(roots["neardup_components"], keep_last=1)
    Q._NEARDUP_MEMO.clear()
    assert rows(Q.QUERIES["dedup_components"](spark, sf)) == want_comp

    monkeypatch.delenv("SPARK_GRAFT_ARTIFACTS")
    Q._NEARDUP_MEMO.clear()


def test_lsh_flag_ingest_equals_two_call_composition(spark, tmp_path):
    """The fused one-pass ingest flagging (round-8 streaming
    throughput fix) must produce EXACTLY the output of the original
    two lsh_flag_against_index calls (vs index; vs own batch
    restricted to smaller ids) reconciled — per-source cap semantics
    included — across incremental batches of a dup-dense corpus."""
    import os

    from pyspark.sql import functions as F

    from document_parsing_etl_pipeline_spark.catalog import load_table
    from document_parsing_etl_pipeline_spark.operators.dedup import (
        lsh_flag_against_index, lsh_flag_ingest, minhash_buckets,
    )
    from document_parsing_etl_pipeline_spark.sources import (
        tableformat as tf,
    )
    from document_parsing_etl_pipeline_spark.streaming import neardup

    docs = load_table(
        spark, "/root/testdata/sf0.001", "documents"
    ).select("doc_id", "text")
    idx = str(tmp_path / "idx")
    neardup.create_index(spark, idx)
    # a tiny cap forces the per-source cap semantics to matter
    for i in range(3):
        b = docs.where(f"doc_id % 3 = {i}").localCheckpoint()
        bb = minhash_buckets(b, num_hashes=8, band_size=2) \
            .localCheckpoint()
        index = tf.read(spark, idx)
        for cap in (3, 50):
            vs_index = lsh_flag_against_index(
                b.select("doc_id"), bb, index, cap)
            vs_batch = lsh_flag_against_index(
                b.select("doc_id"), bb, bb, cap
            ).where(
                (F.col("first_match_doc") >= 0)
                & (F.col("first_match_doc") < F.col("doc_id"))
            )
            old = (
                vs_index.alias("i")
                .join(
                    vs_batch.select(
                        F.col("doc_id").alias("doc_id_b"),
                        F.col("first_match_doc").alias("fm_b"),
                    ),
                    F.col("doc_id") == F.col("doc_id_b"), "left",
                )
                .select(
                    "doc_id",
                    (F.col("is_dup") | F.col("fm_b").isNotNull())
                    .alias("is_dup"),
                    F.when(
                        F.col("first_match_doc") >= 0,
                        F.least(
                            F.col("first_match_doc"),
                            F.coalesce(F.col("fm_b"),
                                       F.col("first_match_doc")),
                        ),
                    ).otherwise(F.coalesce(F.col("fm_b"), F.lit(-1)))
                    .cast("long").alias("first_match_doc"),
                )
            )
            new = lsh_flag_ingest(b.select("doc_id"), bb, index, cap)
            assert sorted(map(tuple, new.collect())) == \
                sorted(map(tuple, old.collect())), f"batch {i} cap {cap}"
        tf.append(spark, bb, idx, extra_meta={"stream_batch_id": i})


def test_artifact_fingerprint_invalidation(spark, tmp_path, monkeypatch):
    """Round-9 ADVICE item: artifact tables are keyed by a SOURCE
    FINGERPRINT (file stats of the tables the builder reads + the
    build-parameter string), not just the sf_dir slug. Regenerating
    the corpus in place must trigger a REPLACE rebuild that serves the
    new corpus; a pre-fingerprint table counts as stale; snapshot
    maintenance (optimize/expire) must NOT trigger a rebuild."""
    import os
    import shutil

    from document_parsing_etl_pipeline_spark.plans import queries as Q
    from document_parsing_etl_pipeline_spark.sources import (
        artifacts, tableformat as tf,
    )

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"):
        shutil.copyfile(f"/root/testdata/sf0.001/{t}.parquet",
                        str(corpus / f"{t}.parquet"))
    sf = str(corpus)
    store = str(tmp_path / "store")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", store)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    Q._NEARDUP_MEMO.clear()
    first = rows(Q.QUERIES["dedup_components"](spark, sf))
    root = artifacts.table_root(store, sf, "neardup_components")
    assert tf._versions(root) == [1]
    assert artifacts._stored_fingerprint(root)

    # unchanged corpus, new "session": read-only, no new version
    Q._NEARDUP_MEMO.clear()
    assert rows(Q.QUERIES["dedup_components"](spark, sf)) == first
    assert tf._versions(root) == [1]

    # snapshot maintenance must carry the fingerprint (no rebuild)
    tf.optimize_table(spark, root, target_file_rows=1_000_000)
    n_after_opt = len(tf._versions(root))
    Q._NEARDUP_MEMO.clear()
    assert rows(Q.QUERIES["dedup_components"](spark, sf)) == first
    assert len(tf._versions(root)) == n_after_opt

    # regenerate the corpus IN PLACE (half the docs): the fingerprint
    # flips, the next access REPLACES the artifact, and the served
    # rows match a from-scratch memo-mode run on the new corpus
    docs = spark.read.parquet(f"{sf}/documents.parquet") \
        .where("doc_id % 2 = 0").localCheckpoint()
    pdf = docs.toPandas()
    os.remove(f"{sf}/documents.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   f"{sf}/documents.parquet")

    monkeypatch.delenv("SPARK_GRAFT_ARTIFACTS")
    Q._NEARDUP_MEMO.clear()
    want_new = rows(Q.QUERIES["dedup_components"](spark, sf))
    assert want_new != first

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", store)
    Q._NEARDUP_MEMO.clear()
    got_new = rows(Q.QUERIES["dedup_components"](spark, sf))
    assert got_new == want_new
    head = tf._load_manifest(root, tf._versions(root)[-1])
    assert head["operation"] == "replace"

    # a pre-fingerprint table (written before round 9) counts as
    # stale: strip the fingerprint, next access rebuilds
    head.pop("artifact_fingerprint")
    import json as _json
    with open(tf._manifest_path(root, head["version"]), "w") as f:
        _json.dump(head, f)
    n_before = len(tf._versions(root))
    Q._NEARDUP_MEMO.clear()
    assert rows(Q.QUERIES["dedup_components"](spark, sf)) == want_new
    assert len(tf._versions(root)) == n_before + 1

    monkeypatch.delenv("SPARK_GRAFT_ARTIFACTS")
    Q._NEARDUP_MEMO.clear()


def test_artifact_mutation_via_merge_triggers_rebuild(
    spark, tmp_path, monkeypatch
):
    """Round-11 (r10 verdict item 7): MUTATING a standing artifact
    table through the table format's own merge path must poison it.
    merge_into is row-mutating, so _carry_meta DROPS the
    artifact_fingerprint — this test closes the loop end-to-end: the
    next _ensure_table access detects the missing fingerprint,
    REBUILDS, and serves builder-true rows (the injected row is gone),
    rather than silently serving mutated rows to hash-gated queries."""
    from document_parsing_etl_pipeline_spark.plans import queries as Q
    from document_parsing_etl_pipeline_spark.sources import (
        artifacts, tableformat as tf,
    )

    sf = "/root/testdata/sf0.001"
    store = str(tmp_path / "store")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", store)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    Q._NEARDUP_MEMO.clear()
    clean = rows(Q._minhash_sigs(spark, sf))
    root = artifacts.table_root(store, sf, "minhash_sigs")
    assert artifacts._stored_fingerprint(root)

    # mutate the standing artifact: inject a row that no builder run
    # would produce
    poison = spark.createDataFrame(
        [tuple([-12345] + ["deadbeef"] * (len(clean[0]) - 1))],
        Q._minhash_sigs(spark, sf).schema,
    )
    tf.merge_into(spark, poison, root, key="doc_id")
    # the mutating commit dropped the fingerprint...
    assert artifacts._stored_fingerprint(root) is None
    # ...and the mutated rows ARE on disk right now
    assert tf.read(spark, root).where("doc_id = -12345").count() == 1

    # next access (fresh "session"): rebuild, not stale serve
    Q._NEARDUP_MEMO.clear()
    got = rows(Q._minhash_sigs(spark, sf))
    assert got == clean
    head = tf._load_manifest(root, tf._versions(root)[-1])
    assert head["operation"] == "replace"
    assert head.get("artifact_fingerprint")
    assert tf.read(spark, root).where("doc_id = -12345").count() == 0

    monkeypatch.delenv("SPARK_GRAFT_ARTIFACTS")
    Q._NEARDUP_MEMO.clear()


def test_setsim_index_group_build_consistency(spark, tmp_path,
                                              monkeypatch):
    """The four setsim-index artifact tables must come from ONE build
    (round-9 ADVICE item): deleting one member and re-accessing must
    rewrite the WHOLE group from a single derivation (every member
    gains a version), and the artifact-mode incremental-components
    result must equal memo mode exactly."""
    import shutil

    from document_parsing_etl_pipeline_spark.plans import queries as Q
    from document_parsing_etl_pipeline_spark.sources import (
        artifacts, tableformat as tf,
    )

    sf = "/root/testdata/sf0.001"
    store = str(tmp_path / "store")

    def rows(df):
        return sorted(map(tuple, df.collect()))

    Q._NEARDUP_MEMO.clear()
    want = rows(Q.QUERIES["q_incremental_components"](spark, sf))

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", store)
    Q._NEARDUP_MEMO.clear()
    assert rows(Q.QUERIES["q_incremental_components"](spark, sf)) == want

    names = ["setsim_index_sh", "setsim_index_pref",
             "setsim_index_hist", "setsim_index_arrays"]
    roots = {n: artifacts.table_root(store, sf, n) for n in names}
    assert all(tf._versions(r) == [1] for r in roots.values())

    # drop one member: the whole group rebuilds from one derivation
    shutil.rmtree(roots["setsim_index_hist"])
    Q._NEARDUP_MEMO.clear()
    assert rows(Q.QUERIES["q_incremental_components"](spark, sf)) == want
    assert tf._versions(roots["setsim_index_hist"]) == [1]
    for n in names:
        if n != "setsim_index_hist":
            assert tf._versions(roots[n]) == [1, 2], n

    monkeypatch.delenv("SPARK_GRAFT_ARTIFACTS")
    Q._NEARDUP_MEMO.clear()


def test_fingerprint_walks_partitioned_source_recursively(tmp_path):
    """Round-10 (r09 advisory): a partitioned source table (key=val
    subdirectories) regenerated IN PLACE changes file stats only
    inside the subdirectories — the fingerprint must see that (a flat
    top-level listdir kept the stale fingerprint and served a stale
    artifact)."""
    import os

    from document_parsing_etl_pipeline_spark.sources import artifacts

    sf = tmp_path / "corpus"
    part = sf / "documents.parquet" / "lang=en"
    part.mkdir(parents=True)
    inner = part / "part-000.parquet"
    inner.write_bytes(b"AAAA")

    fp0 = artifacts.fingerprint(str(sf), "p")
    # same-size in-place rewrite: bump mtime only (the subdir's entry
    # list and sizes are unchanged — exactly the flat-listdir blind
    # spot)
    st = os.stat(inner)
    os.utime(inner, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert artifacts.fingerprint(str(sf), "p") != fp0

    # a NEW file deeper in the tree flips it too
    (part / "part-001.parquet").write_bytes(b"BBBB")
    assert artifacts.fingerprint(str(sf), "p") not in (
        fp0, artifacts.fingerprint(str(sf), "q"))


def test_verify_pairs_slicing_is_result_invariant(spark):
    """Round-10 spill budget: forcing the verification join into
    hash-sliced batches (batch_pairs=1 → one slice per candidate)
    must return EXACTLY the unsliced pair set — slicing is an exact
    partition of the candidate stream, not an approximation."""
    texts = [
        "a b c d e f g h i j",
        "a b c d e f g h i k",
        "a b c d e f g h i j",
        "p q r s t u v w x y",
        "p q r s t u v w x z",
        "one two three four five",
        "one two three four five",
    ]
    from pyspark.sql import functions as F

    df = _docs(spark, *texts)
    num, den, n = 3, 5, 3
    sh, pref = dedup._shingle_prefixes(df, "text", num, den, n, True)
    a = pref.select(
        "term", F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"), F.col("rn").alias("ia"),
    )
    b = pref.select(
        "term", F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"), F.col("rn").alias("ib"),
    )
    joined = (
        a.join(b, "term")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.least("na", "nb") * den >= F.greatest("na", "nb") * num)
        )
    )
    cands = dedup._positional_bound_filter(joined, num, den)
    unsliced = sorted(map(tuple, dedup._verify_pairs(
        cands, sh, num, den).collect()))
    sliced = sorted(map(tuple, dedup._verify_pairs(
        cands, sh, num, den, batch_pairs=1).collect()))
    assert len(unsliced) > 0
    assert sliced == unsliced


def test_band_cap_col_applies_per_band(spark):
    """Round-11 cap engagement: band_cap_col with a {band: cap}
    mapping filters each band at ITS cap; a band missing from the
    mapping falls back to the mapping's smallest cap."""
    from pyspark.sql import functions as F

    rows = spark.createDataFrame(
        [(0, 3), (0, 6), (1, 3), (1, 6), (7, 3), (7, 6)],
        "band int, n int",
    )
    kept = rows.where(
        F.col("n") <= dedup.band_cap_col({0: 5, 1: 10})
    ).collect()
    got = sorted((r.band, r.n) for r in kept)
    # band 0 capped at 5 -> keeps n=3 only; band 1 at 10 -> both;
    # band 7 (unknown) falls back to min(5, 10)=5 -> keeps n=3 only
    assert got == [(0, 3), (1, 3), (1, 6), (7, 3)]
    # int mode is unchanged
    kept_int = rows.where(
        F.col("n") <= dedup.band_cap_col(4)
    ).count()
    assert kept_int == 3


def test_engaged_lsh_caps_match_planner_decision(spark):
    """The caps the pair generators consume (_lsh_caps) must be
    EXACTLY the planner's chosen rows — one decision, two readers.
    Also pins that every cap is one of the planner's candidates."""
    from pyspark.sql import functions as F

    from document_parsing_etl_pipeline_spark.plans import queries as Q

    sf = "/root/testdata/sf0.001"
    planner = Q.QUERIES["q_lsh_cap_planner"](spark, sf)
    chosen = {
        (r["method"], int(r["band"])): int(r["cap"])
        for r in planner.where(F.col("chosen")).collect()
    }
    for method in ("minhash", "simhash"):
        caps = Q._lsh_caps(spark, sf, method)
        assert caps == {
            b: c for (m, b), c in chosen.items() if m == method
        }, method
        assert all(c in Q._CAP_CANDIDATES for c in caps.values())


def test_minhash_candidates_respect_engaged_caps(spark):
    """End-to-end wiring: the candidate set produced with the engaged
    per-band caps equals recomputing with each band's cap applied
    independently — i.e. the dict actually reaches the bucket filter."""
    from pyspark.sql import functions as F

    from document_parsing_etl_pipeline_spark.catalog import load_table
    from document_parsing_etl_pipeline_spark.plans import queries as Q

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    caps = Q._lsh_caps(spark, sf, "minhash")
    engaged = set(map(tuple, dedup.minhash_lsh_candidates(
        docs, num_hashes=8, band_size=2, max_bucket=caps).collect()))
    # manual reference: union of per-band candidate sets, each band
    # filtered at its own cap
    buckets = dedup.minhash_buckets(docs, num_hashes=8, band_size=2)
    manual = set()
    for band, cap in caps.items():
        bb = buckets.where(F.col("band") == band)
        counts = (
            bb.groupBy("band", "bh").agg(F.count("*").alias("n"))
            .where(F.col("n").between(2, cap))
        )
        capped = bb.join(counts.drop("n"), ["band", "bh"])
        a = capped.select("bh", F.col("doc_id").alias("doc_a"))
        b = capped.select("bh", F.col("doc_id").alias("doc_b"))
        manual |= {
            (r.doc_a, r.doc_b)
            for r in a.join(b, "bh")
            .where(F.col("doc_a") < F.col("doc_b")).collect()
        }
    assert engaged == manual and len(engaged) > 0


def test_band_cap_col_empty_mapping_filters_everything(spark):
    """An EMPTY {band: cap} mapping (the planner saw no buckets —
    empty/degenerate corpus) must behave as 'no buckets' (empty pair
    set), not crash with min() of an empty sequence."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = _docs(spark, base, base + " extra")
    assert dedup.minhash_lsh_candidates(df, max_bucket={}).count() == 0
    # non-empty mapping still pairs (band fallback = smallest cap)
    assert dedup.minhash_lsh_candidates(df, max_bucket={0: 50}).count() == 1


def test_ngram_jaccard_pairs_threshold_none_keeps_all_candidates(spark):
    """threshold=None returns EVERY capped candidate with its exact
    jaccard — the verified-candidate relation every downstream
    threshold derives from by filter (plans _verified_candidates)."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = _docs(spark, base, base + " extra", base + " and more extra")
    allp = dedup.ngram_jaccard_pairs(df, threshold=None)
    cands = dedup.minhash_lsh_candidates(df)
    assert allp.count() == cands.count()
    # filtering the verified relation == running with the threshold
    want = {(p.doc_a, p.doc_b, p.jaccard)
            for p in dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()}
    got = {(p.doc_a, p.doc_b, p.jaccard)
           for p in allp.where("jaccard >= 0.5").collect()}
    assert got == want


def test_component_lookup_scans_pruned_artifact(spark, tmp_path, monkeypatch):
    """q_component_lookup's key-scoped artifact read: identical rows
    in memo and artifact-table modes, the artifact table carries the
    lead-column bloom, and after a doc_id re-cluster the probe's
    scan_keys path reads a strict SUBSET of the files (manifest+bloom
    pruning measured, not assumed)."""
    from document_parsing_etl_pipeline_spark.plans import queries as Q
    from document_parsing_etl_pipeline_spark.sources import (
        artifacts, tableformat as tf,
    )

    sf = "/root/testdata/sf0.001"
    Q._NEARDUP_MEMO.clear()
    want = sorted(map(tuple,
                      Q.QUERIES["q_component_lookup"](spark, sf).collect()))
    assert len(want) == len(Q._LOOKUP_DOC_IDS)

    store = str(tmp_path / "artifacts")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", store)
    Q._NEARDUP_MEMO.clear()
    got = sorted(map(tuple,
                     Q.QUERIES["q_component_lookup"](spark, sf).collect()))
    assert got == want

    root = artifacts.table_root(store, sf, "neardup_components")
    head = tf._load_manifest(root, tf._versions(root)[-1])
    assert head.get("bloom_cols") == ["doc_id"]

    # deployment maintenance: re-cluster the artifact on doc_id so
    # per-file ranges are narrow, then MEASURE the probe's pruning
    total = tf.read(spark, root).count()
    tf.optimize_table(spark, root, target_file_rows=max(1, total // 8),
                      cluster_by="doc_id")
    pruned, files_read, files_total = tf.scan_keys(
        spark, root, "doc_id", list(Q._LOOKUP_DOC_IDS))
    assert files_total >= 8
    assert files_read < files_total, (files_read, files_total)
    # the query still returns exact rows through the pruned path
    Q._NEARDUP_MEMO.clear()
    again = sorted(map(tuple,
                       Q.QUERIES["q_component_lookup"](spark, sf).collect()))
    assert again == want


def test_artifact_stale_rebuild_upgrades_prebloom_layout(
    spark, tmp_path, monkeypatch,
):
    """Round-13 advice: an artifact table created WITHOUT the lead
    bloom (pre-round-12 store) must gain it on the fingerprint-stale
    full rebuild — tf.replace used to carry the prior head's (empty)
    bloom config, so old stores never picked up the round-12 layout
    and key-scoped scans stayed range-stats-only forever."""
    from document_parsing_etl_pipeline_spark.sources import (
        artifacts, tableformat as tf,
    )

    sf = "/root/testdata/sf0.001"
    store = str(tmp_path / "arts")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", store)
    root = artifacts.table_root(store, sf, "up_demo")

    def build():
        return spark.range(0, 50).selectExpr(
            "id AS doc_id", "id * 2 AS payload"
        )

    # simulate the pre-bloom store: create directly, no bloom_cols,
    # and a fingerprint that will read as stale
    tf.create_table(spark, build(), root, stats_cols=["doc_id"],
                    extra_meta={"artifact_fingerprint": "old"})
    head = tf._load_manifest(root, tf._versions(root)[-1])
    assert "bloom_cols" not in head

    memo: dict = {}
    artifacts.load_or_build(
        spark, sf, "up_demo", build, memo, ("k",), params="p1",
    )
    head = tf._load_manifest(root, tf._versions(root)[-1])
    assert head["operation"] == "replace"
    assert head.get("bloom_cols") == ["doc_id"]
    assert all(
        "nbits" in e["blooms"]["doc_id"] for e in head["files"]
    )
    # the upgraded layout actually serves key-scoped scans
    _, fr, ft = tf.scan_keys(spark, root, "doc_id", [3])
    assert fr <= ft
    got = artifacts.scan_artifact_keys(
        spark, sf, "up_demo", build, memo, ("k2",),
        col="doc_id", keys=[3], params="p1",
    )
    assert [r.payload for r in got.collect()] == [6]


def test_incremental_setsim_scoped_reads_match_and_prune(
    spark, tmp_path, monkeypatch,
):
    """Round-13 lead item: with an artifact store configured,
    q_incremental_components reads the standing setsim INDEX members
    key-scoped (posting lists by the batch's shingle terms,
    signatures/arrays by candidate ids) through manifest+bloom file
    pruning — identical component rows to memo mode, and the pruning
    is MEASURED on the clustered posting member, not assumed."""
    from document_parsing_etl_pipeline_spark.plans import queries as Q
    from document_parsing_etl_pipeline_spark.sources import (
        artifacts, tableformat as tf,
    )

    sf = "/root/testdata/sf0.001"
    Q._NEARDUP_MEMO.clear()
    want = sorted(map(tuple,
                      Q.QUERIES["q_incremental_components"](
                          spark, sf).collect()))
    assert want

    store = str(tmp_path / "arts")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", store)
    Q._NEARDUP_MEMO.clear()
    got = sorted(map(tuple,
                     Q.QUERIES["q_incremental_components"](
                         spark, sf).collect()))
    assert got == want

    # the posting member is clustered+bloomed on term, and a
    # few-term probe reads a strict subset of its files
    root = artifacts.table_root(store, sf, "setsim_index_pref")
    head = tf._load_manifest(root, tf._versions(root)[-1])
    assert head.get("bloom_cols") == ["term"]
    some = [r.term for r in
            tf.read(spark, root).select("term").limit(3).collect()]
    pruned, fr, ft = tf.scan_keys(spark, root, "term", some)
    assert ft > 4 and 1 <= fr < ft, (fr, ft)
    # reader contract: rows exactly key-filtered
    reader = Q._setsim_scoped(spark, sf)
    got_rows = sorted(map(tuple,
                          reader("pref", "term", some).collect()))
    full = tf.read(spark, root)
    want_rows = sorted(map(tuple,
                           full.where(full["term"].isin(some))
                           .collect()))
    assert got_rows == want_rows


def test_incremental_dedup_scoped_index_matches_and_prunes(
    spark, tmp_path, monkeypatch,
):
    """q_incremental_dedup's artifact-mode path: the batch's bucket
    hashes key-scope the standing minhash bucket INDEX (bh-clustered
    and bloomed) — identical flag rows to memo mode, measured file
    pruning for a small probe."""
    from document_parsing_etl_pipeline_spark.plans import queries as Q
    from document_parsing_etl_pipeline_spark.sources import (
        artifacts, tableformat as tf,
    )

    sf = "/root/testdata/sf0.001"
    Q._NEARDUP_MEMO.clear()
    want = sorted(map(tuple,
                      Q.QUERIES["q_incremental_dedup"](
                          spark, sf).collect()))
    assert want

    store = str(tmp_path / "arts")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", store)
    Q._NEARDUP_MEMO.clear()
    got = sorted(map(tuple,
                     Q.QUERIES["q_incremental_dedup"](
                         spark, sf).collect()))
    assert got == want

    root = artifacts.table_root(store, sf, "minhash_index")
    head = tf._load_manifest(root, tf._versions(root)[-1])
    assert head.get("bloom_cols") == ["bh"]
    some = [r.bh for r in
            tf.read(spark, root).select("bh").limit(2).collect()]
    _, fr, ft = tf.scan_keys(spark, root, "bh", some)
    assert ft > 4 and 1 <= fr < ft, (fr, ft)


def test_artifact_refresh_on_append_is_incremental_and_exact(
    spark, tmp_path, monkeypatch,
):
    """Round-13 verdict #3: when the corpus grows APPEND-ONLY (old
    files byte-identical, new files added), the standing setsim
    pair/component artifacts refresh through the proven incremental
    path — batch×corpus pairs committed as a table APPEND, the
    component map updated by contraction — instead of re-shingling
    and re-pairing the corpus. Rows must be identical to a full
    rebuild (the exactness q_incremental_components' oracle proves),
    and any non-append mutation must fall back to the rebuild."""
    import os

    from document_parsing_etl_pipeline_spark.operators import dedup
    from document_parsing_etl_pipeline_spark.plans import queries as Q
    from document_parsing_etl_pipeline_spark.sources import (
        artifacts, tableformat as tf,
    )

    src = str(tmp_path / "corpus")
    docs_dir = os.path.join(src, "documents.parquet")
    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    base.where("doc_id < 400").repartition(4).write.parquet(docs_dir)

    store = str(tmp_path / "arts")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", store)
    Q._NEARDUP_MEMO.clear()
    artifacts.REFRESH_EVENTS.clear()
    p1 = Q._standing_setsim_pairs(spark, src).count()
    Q._standing_setsim_components(spark, src).count()
    Q._standing_setsim_index(spark, src)  # the standing index too
    modes = {e["name"]: e["mode"] for e in artifacts.REFRESH_EVENTS}
    assert modes["setsim_pairs"] == "create"
    assert modes["setsim_components"] == "create"

    # append-only growth: new doc files land, old files untouched
    base.where("doc_id >= 400").repartition(2).write.mode(
        "append").parquet(docs_dir)
    Q._NEARDUP_MEMO.clear()
    artifacts.REFRESH_EVENTS.clear()
    comps2 = sorted(map(tuple,
                        Q._standing_setsim_components(
                            spark, src).collect()))
    pairs2 = sorted(map(tuple,
                        Q._standing_setsim_pairs(spark, src)
                        .collect()))
    modes = {e["name"]: e["mode"] for e in artifacts.REFRESH_EVENTS}
    assert modes["setsim_pairs"] == "refresh", modes
    assert modes["setsim_components"] == "refresh", modes
    # the index group refreshed too: per-doc members APPEND their
    # delta, only the df-ranked prefix member replaced
    assert modes["setsim_index_sh"] == "refresh", modes
    iroot = artifacts.table_root(store, src, "setsim_index_sh")
    ihead = tf._load_manifest(iroot, tf._versions(iroot)[-1])
    assert ihead["operation"] == "append"
    proot_pref = artifacts.table_root(store, src, "setsim_index_pref")
    phead = tf._load_manifest(
        proot_pref, tf._versions(proot_pref)[-1])
    assert phead["operation"] == "replace"
    # the pairs refresh committed an APPEND (delta-sized), not a
    # table rewrite
    proot = artifacts.table_root(store, src, "setsim_pairs")
    head = tf._load_manifest(proot, tf._versions(proot)[-1])
    assert head["operation"] == "append"

    # exactness: refreshed artifacts == from-scratch over the grown
    # corpus
    grown = spark.read.parquet(docs_dir).where("doc_id % 5 != 0")
    want_pairs = sorted(map(tuple, dedup.setsim_prefix_join(
        grown, threshold_num=3, threshold_den=5).collect()))
    assert pairs2 == want_pairs
    assert len(pairs2) > p1  # the append really added pairs
    wp = dedup.setsim_prefix_join(
        grown, threshold_num=3, threshold_den=5)
    want_comps = sorted(map(tuple, dedup.connected_components(
        wp, max_iter=30).collect()))
    assert comps2 == want_comps

    # NON-append mutation (rewrite a file in place) falls back to the
    # full rebuild — never serves an incremental guess
    import glob as _glob
    victim = sorted(_glob.glob(os.path.join(docs_dir, "part-*")))[0]
    os.utime(victim, ns=(1, 1))
    Q._NEARDUP_MEMO.clear()
    artifacts.REFRESH_EVENTS.clear()
    pairs3 = sorted(map(tuple,
                        Q._standing_setsim_pairs(spark, src)
                        .collect()))
    modes = {e["name"]: e["mode"] for e in artifacts.REFRESH_EVENTS}
    assert modes["setsim_pairs"] == "rebuild", modes
    assert pairs3 == want_pairs


def test_verified_candidates_refresh_on_append_stable_caps(
    spark, tmp_path, monkeypatch,
):
    """Round-14 (r13 verdict item 9): the capped-LSH verified-candidate
    artifact — previously excluded from append-refresh because caps
    drift under growth — refreshes incrementally when the CAP-STABILITY
    gate passes: engaged caps unchanged (params fingerprint) AND no
    previously-pairable bucket pushed over its cap by the appended
    docs (checked inside the refresher). The refreshed rows must equal
    a from-scratch verification over the grown corpus, and the
    ≥0.5-pair consumer must equal the same filter of it."""
    import os

    from document_parsing_etl_pipeline_spark.operators import dedup
    from document_parsing_etl_pipeline_spark.plans import queries as Q
    from document_parsing_etl_pipeline_spark.plans import _prelude as P
    from document_parsing_etl_pipeline_spark.sources import (
        artifacts, tableformat as tf,
    )

    src = str(tmp_path / "corpus")
    docs_dir = os.path.join(src, "documents.parquet")
    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    base.where("doc_id < 400").repartition(4).write.parquet(docs_dir)

    store = str(tmp_path / "arts")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", store)
    Q._NEARDUP_MEMO.clear()
    artifacts.REFRESH_EVENTS.clear()
    caps_before = P._caps_tag(P._lsh_caps(spark, src, "minhash"))
    n1 = P._verified_candidates(spark, src).count()
    modes = {e["name"]: e["mode"] for e in artifacts.REFRESH_EVENTS}
    assert modes["neardup_verified"] == "create"

    # append-only growth: new doc files land, old files untouched
    base.where("doc_id >= 400").repartition(2).write.mode(
        "append").parquet(docs_dir)
    Q._NEARDUP_MEMO.clear()
    artifacts.REFRESH_EVENTS.clear()
    caps_after = P._caps_tag(P._lsh_caps(spark, src, "minhash"))
    # the stable-cap premise of this test's corpus split — if the
    # generator ever changes and this trips, pick a split where the
    # engaged caps stay put (the drifted-caps path is the rebuild,
    # already covered by the params fingerprint)
    assert caps_after == caps_before
    got = sorted(map(tuple,
                     P._verified_candidates(spark, src).collect()))
    modes = {e["name"]: e["mode"] for e in artifacts.REFRESH_EVENTS}
    assert modes["neardup_verified"] == "refresh", modes
    assert modes.get("minhash_sigs") == "refresh", modes
    vroot = artifacts.table_root(store, src, "neardup_verified")
    head = tf._load_manifest(vroot, tf._versions(vroot)[-1])
    assert head["operation"] == "append"  # gate passed: no crossing

    # exactness: refreshed artifact == from-scratch verification of
    # the grown corpus at the same (stable) caps
    grown = spark.read.parquet(docs_dir)
    caps = P._lsh_caps(spark, src, "minhash")
    want = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        grown, num_hashes=P._MH_K, band_size=P._MH_BAND,
        max_bucket=caps, threshold=None,
    ).collect()))
    assert got == want
    assert len(got) > n1  # the append really added candidates

    # the >=0.5 pair consumer derives by filter from the refreshed
    # artifact (its own builder reads the refreshed table)
    Q._NEARDUP_MEMO.clear()
    pairs = sorted(map(tuple, P._jaccard_pairs(spark, src).collect()))
    want_pairs = sorted(t for t in want
                        if t[2] is not None and t[2] >= 0.5)
    assert pairs == want_pairs
