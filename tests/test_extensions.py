"""Tests for the LLM-data-pipeline operators (dedup / similarity / text /
multimodal) on constructed frames with known ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_task_adtech_data_pipeline_spark.operators import (
    dedup,
    multimodal,
    similarity,
    text,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup of 1
    (4, "completely different content about spark query engines and shuffles"),
    (5, "El rapido zorro marron salta sobre el perro que duerme en la casa"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(docs):
    out = dedup.exact_dedup(docs)
    ids = {r.doc_id for r in out.collect()}
    assert ids == {1, 3, 4, 5}  # 2 removed, survivor is min-id 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # exact dup
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0  # near dup
    assert all(4 not in p and 5 not in p for p in pairs)


def test_minhash_dedup_removes_dups(docs):
    kept = {r.doc_id for r in dedup.minhash_dedup(docs, verify_threshold=0.5).collect()}
    assert 2 not in kept  # exact dup always caught
    assert {4, 5} <= kept  # distinct docs survive
    assert 1 in kept  # min-id survivor


def test_simhash_near_dup_distance(docs):
    sigs = dedup.simhash_signatures(docs)
    cand = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_candidates(sigs, max_hamming=16).collect()
    }
    assert cand.get((1, 2)) == 0  # identical text -> identical simhash
    assert (1, 3) in cand  # near dup within a few bits


def test_brute_force_topk_exact(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),  # closest to 1
            (3, [0.0, 1.0, 0.0]),
            (4, [-1.0, 0.0, 0.0]),  # opposite of 1
        ],
        "vec_id long, embedding array<float>",
    )
    out = similarity.brute_force_topk(emb, emb.where(F.col("vec_id") == 1), k=3)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.corpus_id for r in rows] == [2, 3, 4]
    assert rows[0].cosine_sim == pytest.approx(0.9939, abs=1e-3)
    assert rows[2].cosine_sim == pytest.approx(-1.0)


def test_lsh_topk_recall_on_testdata(spark):
    from conftest import SF_ORACLE
    from data_engineering_task_adtech_data_pipeline_spark.sources.readers import Testdata

    emb = Testdata(spark, SF_ORACLE).embeddings
    q = emb.where(F.col("vec_id") < 20)
    bf = {(r.query_id, r.corpus_id) for r in similarity.brute_force_topk(emb, q, k=5).collect()}
    lsh = {(r.query_id, r.corpus_id) for r in
           similarity.lsh_topk(emb, q, k=5, planes=16, bands=8).collect()}
    recall = len(bf & lsh) / len(bf)
    assert recall >= 0.8, recall  # 2-bit bands: high multi-probe recall


def test_lsh_topk_md5_matches_xxhash_shape(spark):
    """md5-portable hyperplanes are a drop-in: same schema, same recall
    contract, deterministic weights from the plan-time literal matrix."""
    from conftest import SF_ORACLE
    from data_engineering_task_adtech_data_pipeline_spark.sources.readers import Testdata

    w1 = similarity.md5_plane_weights(4, 8, seed=42)
    w2 = similarity.md5_plane_weights(4, 8, seed=42)
    assert w1 == w2
    assert all(x in (1.0, -1.0) for row in w1 for x in row)
    assert w1 != similarity.md5_plane_weights(4, 8, seed=43)

    emb = Testdata(spark, SF_ORACLE).embeddings
    q = emb.where(F.col("vec_id") < 10)
    bf = {(r.query_id, r.corpus_id) for r in
          similarity.brute_force_topk(emb, q, k=5).collect()}
    lsh = {(r.query_id, r.corpus_id) for r in
           similarity.lsh_topk(emb, q, k=5, planes=16, bands=8,
                               hash_method="md5", dim=64).collect()}
    assert len(bf & lsh) / len(bf) >= 0.8


def test_embedding_dup_pairs_finds_planted_dups(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.1, 0.0]),
            (2, [1.0, 0.01, 0.1, 0.0]),  # near-dup of 1
            (3, [0.0, 1.0, 0.0, 0.2]),
            (4, [0.0, 1.0, 0.01, 0.2]),  # near-dup of 3
            (5, [-1.0, 0.5, 0.0, 0.0]),  # no dup
        ],
        "vec_id long, embedding array<float>",
    )
    out = similarity.embedding_dup_pairs(
        emb, threshold=0.99, planes=16, bands=8, hash_method="md5", dim=4
    )
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 2) in pairs
    assert (3, 4) in pairs
    assert all(a < b for a, b in pairs)
    assert not any(5 in p for p in pairs)


def test_ivf_topk_recall_and_determinism(spark):
    from conftest import SF_ORACLE
    from data_engineering_task_adtech_data_pipeline_spark.sources.readers import Testdata

    emb = Testdata(spark, SF_ORACLE).embeddings
    q = emb.where(F.col("vec_id") < 10)
    c1 = similarity.kmeans_fit(emb, n_cells=8, n_iter=3, dim=64)
    c2 = similarity.kmeans_fit(emb.repartition(7), n_cells=8, n_iter=3, dim=64)
    assert c1 == c2  # rounding makes training partition-independent

    bf = {(r.query_id, r.corpus_id) for r in
          similarity.brute_force_topk(emb, q, k=5).collect()}
    ivf = {(r.query_id, r.corpus_id) for r in
           similarity.ivf_topk(emb, q, k=5, n_cells=8, n_iter=3,
                               n_probe=2, dim=64).collect()}
    assert len(bf & ivf) / len(bf) >= 0.7  # probing 2/8 cells


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog are in the house with the mouse"),
            (2, "el perro y la casa de los gatos por una calle"),
            (3, "xyzzy plugh qwerty"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lang_pred for r in text.lang_id(df).collect()}
    assert out == {1: "en", 2: "es", 3: "und"}


def test_quality_and_tokens_edge_empty(spark):
    df = spark.createDataFrame([(1, ""), (2, "ab 12 CD!")],
                               "doc_id long, text string")
    q = {r.doc_id: r for r in text.quality_features(df).collect()}
    assert q[1].n_words == 0 and q[1].mean_word_len == 0.0
    assert q[2].digit_ratio == pytest.approx(2 / 9)
    t = {r.doc_id: r for r in text.token_counts(df).collect()}
    assert t[2].regex_tokens == 4  # ab / 12 / CD / !


def test_multimodal_plumbing(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"abcdef")), (2, None)], "media_id long, payload binary"
    )
    media = multimodal.attach_meta(media, modality="image", mime="image/fake")
    metas = {r.media_id: r.meta for r in media.collect()}
    assert metas[1].n_bytes == 6 and metas[1].modality == "image"

    feats = {r.media_id: r for r in
             multimodal.decode_images(media, fake=True).collect()}
    assert feats[1].decode_ok and len(feats[1].feature) == 8
    assert not feats[2].decode_ok and feats[2].feature is None

    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        multimodal.decode_images(media, fake=False).collect()


def test_connected_components_chains(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = {(r.id, r.component) for r in connected_components(edges).collect()}
    assert out == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_connected_components_star_matches_and_survives_long_paths(spark):
    """large/small-star CC agrees with min-label propagation on random
    graphs, AND solves the shape that defeats a bounded propagation budget:
    a 60-node path has diameter 59 > the default 20 rounds, but the star
    algorithm needs only O(log^2 n)."""
    import random

    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(42)
    pairs = {(rng.randint(0, 40), rng.randint(0, 40)) for _ in range(50)}
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs if a != b], "id_a long, id_b long"
    )
    base = {(r.id, r.component) for r in connected_components(edges).collect()}
    star = {(r.id, r.component) for r in connected_components_star(edges).collect()}
    assert star == base

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 159)], "id_a long, id_b long"
    )
    out = {(r.id, r.component) for r in connected_components_star(path).collect()}
    assert out == {(i, 100) for i in range(100, 160)}


def test_update_components_matches_full_recompute(spark):
    """Folding a second edge wave into an existing closure fixpoint equals
    star closure over the union — across component merges, a new id that
    becomes the merged component's new min, intra-component no-op edges,
    a contracted self-loop, and untouched singleton assignments."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        connected_components_star,
        update_components,
    )

    e1 = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21), (30, 31), (40, 41)],
        "id_a long, id_b long",
    )
    # merges {10,11,12}+{20,21}; new id 5 joins 30's group and becomes its
    # new min; brand-new pair (50,51); intra-component no-op (10,12);
    # self-loop on a brand-new id (60,60)
    e2 = spark.createDataFrame(
        [(12, 20), (5, 31), (50, 51), (10, 12), (60, 60)],
        "id_a long, id_b long",
    )
    assigns = connected_components_star(e1).unionByName(
        spark.createDataFrame([(99, 99)], "id long, component long")
    )
    out = {(r.id, r.component) for r in update_components(assigns, e2).collect()}
    full = {
        (r.id, r.component)
        for r in connected_components_star(e1.unionByName(e2)).collect()
    }
    # the singleton is untouched; the self-loop-only new id labels itself
    assert out == full | {(99, 99), (60, 60)}


def test_update_components_randomized_waves(spark):
    """Three sequential incremental folds over random edge waves equal one
    from-scratch closure of everything (property over 3 seeds)."""
    import random

    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        connected_components_star,
        update_components,
    )

    for seed in (7, 19, 23):
        rng = random.Random(seed)
        waves = [
            [
                (rng.randint(0, 60), rng.randint(0, 60))
                for _ in range(25)
            ]
            for _ in range(3)
        ]
        frames = [
            spark.createDataFrame(
                [(a, b) for a, b in w if a != b], "id_a long, id_b long"
            )
            for w in waves
        ]
        assigns = connected_components_star(frames[0])
        for f in frames[1:]:
            assigns = update_components(assigns, f).localCheckpoint()
        allv = frames[0]
        for f in frames[1:]:
            allv = allv.unionByName(f)
        full = {
            (r.id, r.component)
            for r in connected_components_star(allv).collect()
        }
        got = {(r.id, r.component) for r in assigns.collect()}
        assert got == full, f"seed {seed}"


def test_update_components_plan_broadcast_only(spark, tmp_path):
    """The assignment table is touched by exactly two broadcast passes:
    the serving plan over a parquet-backed assignment table must contain
    no SortMergeJoin and no shuffle of the assignments scan — the property
    that makes maintenance O(batch) against a 100 TB table."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        update_components,
    )

    path = str(tmp_path / "assigns")
    spark.createDataFrame(
        [(i, i - (i % 3)) for i in range(3000)], "id long, component long"
    ).write.parquet(path)
    assigns = spark.read.parquet(path)
    edges = spark.createDataFrame(
        [(1, 4), (2999, 5000), (5001, 5002)], "id_a long, id_b long"
    )
    out = update_components(assigns, edges)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    got = {(r.id, r.component) for r in out.collect()}
    # group {0,1,2} merged with {3,4,5} under root 0; 2999's group gained
    # 5000; the fresh pair got its own component; everything else intact
    assert {(i, 0) for i in range(6)} <= got
    assert (5000, 2997) in got and (5001, 5001) in got and (5002, 5001) in got
    assert (2998, 2997) in got and (6, 6) in got
    assert len(got) == 3003


def test_components_store_lifecycle(spark, tmp_path):
    """Persisted component store: init → two incremental edge folds →
    view == from-scratch closure at every step; the delta holds ONLY the
    changed rows; compaction folds it (view unchanged, delta gone) and a
    later update keeps working; leftover .rewriting refuses compaction."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        components_compact,
        components_read,
        components_update,
        components_write,
        connected_components_star,
    )

    root = str(tmp_path / "comp")
    e1 = spark.createDataFrame(
        [(10, 11), (20, 21), (30, 31)], "id_a long, id_b long"
    )
    components_write(connected_components_star(e1), root)

    def view():
        return {
            (r.id, r.component) for r in components_read(spark, root).collect()
        }

    assert view() == {(10, 10), (11, 10), (20, 20), (21, 20), (30, 30), (31, 30)}

    # wave 2: merge {10,11}+{20,21}, add a fresh pair
    e2 = spark.createDataFrame([(11, 21), (50, 51)], "id_a long, id_b long")
    n2 = components_update(spark, root, e2)
    # changed rows: 20, 21 relabeled to 10; new ids 50, 51 — NOT 10/11/30/31
    assert n2 == 4
    full2 = {
        (r.id, r.component)
        for r in connected_components_star(e1.unionByName(e2)).collect()
    }
    assert view() == full2

    # wave 3: new id 5 becomes the merged component's new min
    e3 = spark.createDataFrame([(5, 21)], "id_a long, id_b long")
    n3 = components_update(spark, root, e3)
    assert n3 == 5  # 10, 11, 20, 21 relabeled to 5, plus new id 5
    allv = e1.unionByName(e2).unionByName(e3)
    full3 = {
        (r.id, r.component) for r in connected_components_star(allv).collect()
    }
    assert view() == full3

    folded = components_compact(spark, root)
    assert folded == n2 + n3
    assert view() == full3
    import os

    assert not os.path.isdir(os.path.join(root, "delta"))
    assert components_compact(spark, root) == 0  # idempotent no-op

    # updates keep working post-compact, versions stay monotonic
    e4 = spark.createDataFrame([(30, 50)], "id_a long, id_b long")
    n4 = components_update(spark, root, e4)
    assert n4 == 2  # 50, 51 relabeled to 30
    full4 = {
        (r.id, r.component)
        for r in connected_components_star(allv.unionByName(e4)).collect()
    }
    assert view() == full4

    # a batch whose edges all lie inside existing components is a no-op:
    # returns 0, writes nothing, does not move the generation
    gen_before = (tmp_path / "comp" / "generation").read_text()
    noop = spark.createDataFrame([(5, 10), (30, 31)], "id_a long, id_b long")
    assert components_update(spark, root, noop) == 0
    assert (tmp_path / "comp" / "generation").read_text() == gen_before
    assert view() == full4

    os.makedirs(os.path.join(root, "base.rewriting"))
    with pytest.raises(RuntimeError, match="interrupted"):
        components_compact(spark, root)


def test_components_store_plan_base_never_shuffles(spark, tmp_path):
    """The store view and the update's changed-row pipeline keep the base
    scan on the broadcast-only path (no SortMergeJoin anywhere in the
    view plan) — the property that makes per-batch maintenance O(batch)
    against a 100 TB base."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        components_read,
        components_update,
        components_write,
    )

    root = str(tmp_path / "comp")
    components_write(
        spark.createDataFrame(
            [(i, i - (i % 2)) for i in range(2000)], "id long, component long"
        ),
        root,
    )
    components_update(
        spark,
        root,
        spark.createDataFrame([(0, 2), (7777, 7778)], "id_a long, id_b long"),
    )
    v = components_read(spark, root)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    got = {(r.id, r.component) for r in v.collect()}
    assert {(0, 0), (1, 0), (2, 0), (3, 0), (7777, 7777), (7778, 7777)} <= got
    assert len(got) == 2002


def test_minhash_index_links_feed_update_components(spark, tmp_path):
    """keep="links" surfaces the verified batch↔corpus pairs the dedup
    decision used, and those edges fold into a cluster assignment table:
    the served-index pipeline (index → links → update_components) ends
    with batch dups assigned to their corpus doc's component."""
    from data_engineering_task_adtech_data_pipeline_spark.operators import dedup

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "an entirely different corpus document about spark pipelines"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog again and again"),
            (11, "no relation to anything stored whatsoever in this index"),
        ],
        "doc_id long, text string",
    )
    root = str(tmp_path / "idx")
    dedup.minhash_index_write(corpus, root, num_hashes=32, bands=8)
    links = dedup.minhash_index_dedup(
        batch, root, verify_threshold=0.5, keep="links"
    )
    rows = {(r.id_a, r.id_b) for r in links.collect()}
    assert rows == {(10, 1)}
    assigns = spark.createDataFrame(
        [(1, 1), (2, 2)], "id long, component long"
    )
    updated = {
        (r.id, r.component)
        for r in dedup.update_components(assigns, links).collect()
    }
    assert updated == {(1, 1), (2, 2), (10, 1)}
    with pytest.raises(ValueError):
        dedup.minhash_index_dedup(batch, root, keep="everything")


def test_minhash_dedup_transitive_closure(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        minhash_dedup_transitive,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank today ok"),
            (2, "the quick brown fox jumps over the lazy dog near the river bank tonight ok"),
            (3, "a quick brown fox jumps over the lazy dog near the river bank tonight ok"),
            (4, "completely different content about spark query engines and shuffles"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in minhash_dedup_transitive(docs, verify_threshold=0.5).collect())
    # 3 is a near-dup of 2 which is a near-dup of 1: the whole chain collapses
    assert kept == [1, 4]


def test_chunking_overlap_semantics(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.chunking import (
        chunk_documents,
    )

    words = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame([(1, words), (2, "short doc"), (3, "")],
                               "doc_id long, text string")
    out = {(r.doc_id, r.chunk_id): r for r in
           chunk_documents(df, chunk_tokens=10, overlap=2).collect()}
    # doc 1: 25 words, step 8 -> chunks at 0,8,16 -> ceil((25-2)/8)=3 chunks
    assert {(d, c) for d, c in out} == {(1, 0), (1, 1), (1, 2), (2, 0)}
    c0, c1, c2 = out[(1, 0)], out[(1, 1)], out[(1, 2)]
    assert c0.chunk_text.split()[:2] == ["w0", "w1"] and c0.n_tokens == 10
    # overlap: chunk 1 starts 2 tokens before chunk 0 ends
    assert c1.chunk_text.split()[0] == "w8"
    assert c0.chunk_text.split()[-2:] == ["w8", "w9"]
    assert c2.chunk_text.split()[0] == "w16" and c2.n_tokens == 9
    assert out[(2, 0)].n_tokens == 2  # short doc: single trailing chunk
    # empty doc produces no chunks (doc 3 absent)


def test_sequence_packing_stream_semantics(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.chunking import (
        pack_documents,
    )

    df = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 100), (4, 50)], "doc_id long, n_tokens long"
    )
    out = {r.doc_id: r for r in pack_documents(df, bin_tokens=512).collect()}
    assert (out[1].stream_pos, out[1].bin_id, out[1].bin_offset) == (0, 0, 0)
    # doc 2 starts at 300, still bin 0, straddles the 512 cut (as intended)
    assert (out[2].stream_pos, out[2].bin_id, out[2].bin_offset) == (300, 0, 300)
    assert (out[3].stream_pos, out[3].bin_id, out[3].bin_offset) == (600, 1, 88)
    assert (out[4].stream_pos, out[4].bin_id) == (700, 1)


def test_sequence_packing_distributed_prefix_sum(spark):
    """The two-pass prefix sum must be partition-count-invariant: stream_pos
    depends only on global order, never on where range boundaries fall."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.chunking import (
        pack_documents,
    )

    rows = [(i, (i * 37) % 200 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    expect_pos = {}
    acc = 0
    for i, t in rows:  # doc_id order == insertion order here
        expect_pos[i] = acc
        acc += t
    for nparts in (1, 7, 32):
        got = {
            r.doc_id: r.stream_pos
            for r in pack_documents(
                df, bin_tokens=512, num_partitions=nparts
            ).collect()
        }
        assert got == expect_pos, f"num_partitions={nparts}"


def test_sequence_packing_plan_has_no_single_partition_exchange(spark):
    """q43's scale guarantee: the corpus never funnels through one task."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.chunking import (
        pack_documents,
    )

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50 + 1).alias("n_tokens")
    )
    plan = pack_documents(df, bin_tokens=512)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_greedy_packing_no_straddle(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.chunking import (
        pack_documents_greedy,
    )

    df = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 100), (4, 50), (5, 600), (6, 10)],
        "doc_id long, n_tokens long",
    )
    out = {r.doc_id: r for r in pack_documents_greedy(df, bin_tokens=512).collect()}
    # doc 2 would overflow bin 0 (300+300>512) -> starts bin 1; doc 3 fits
    assert (out[1].bin_id, out[1].bin_offset) == (0, 0)
    assert (out[2].bin_id, out[2].bin_offset) == (1, 0)
    assert (out[3].bin_id, out[3].bin_offset) == (1, 300)
    assert (out[4].bin_id, out[4].bin_offset) == (1, 400)
    # oversized doc 5 (600>512) gets its own bin, never split
    assert (out[5].bin_id, out[5].bin_offset) == (2, 0)
    assert (out[6].bin_id, out[6].bin_offset) == (3, 0)


def test_greedy_packing_sharded_invariants(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.chunking import (
        pack_documents_greedy,
    )

    rows = [(i, (i * 31) % 100 + 1, f"s{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, shard string")
    out = pack_documents_greedy(
        df, bin_tokens=128, shard_col="shard"
    ).collect()
    assert len(out) == 200  # every document placed exactly once
    by_bin: dict[tuple, list] = {}
    for r in out:
        by_bin.setdefault((r.shard, r.bin_id), []).append(r)
    for (shard, _), members in by_bin.items():
        members.sort(key=lambda r: r.bin_offset)
        fill = 0
        for m in members:
            assert m.bin_offset == fill  # contiguous, no gaps
            fill += m.n_tokens
        # no straddle: a bin only exceeds capacity for a lone oversized doc
        assert fill <= 128 or len(members) == 1


def test_greedy_packing_auto_shards_large_input(spark):
    """Round-3 VERDICT missing #3: shard_col=None must not funnel a large
    frame through one pandas group — above target_shard_rows a deterministic
    hash shard engages, output carries pack_shard, and per-(shard, bin)
    invariants still hold."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.chunking import (
        pack_documents_greedy,
    )

    df = spark.range(100_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 60 + 1).alias("n_tokens")
    )
    out = pack_documents_greedy(df, bin_tokens=256, target_shard_rows=10_000)
    assert "pack_shard" in out.columns
    rows = out.collect()
    assert len(rows) == 100_000  # every document placed exactly once
    shards = {r.pack_shard for r in rows}
    assert len(shards) == 10  # ceil(100k / 10k) hash shards, all populated
    # greedy invariants hold inside every (shard, bin)
    by_bin: dict[tuple, list] = {}
    for r in rows:
        by_bin.setdefault((r.pack_shard, r.bin_id), []).append(r)
    for members in by_bin.values():
        members.sort(key=lambda r: r.bin_offset)
        fill = 0
        for m in members:
            assert m.bin_offset == fill
            fill += m.n_tokens
        assert fill <= 256 or len(members) == 1
    # small inputs keep the exact global single-sequence semantics + schema
    small = pack_documents_greedy(
        df.limit(100), bin_tokens=256, target_shard_rows=10_000
    )
    assert "pack_shard" not in small.columns


def test_decontaminate_drops_ngram_overlap(spark):
    # doc 11 repeats benchmark doc 1's opening 5-gram verbatim; doc 12 shares
    # nothing; doc 13 is shorter than the gram size and can never be flagged
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (11, "prefix words alpha beta gamma delta epsilon and a suffix"),
            (12, "entirely disjoint vocabulary with no shared sequences at all"),
            (13, "alpha beta gamma"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id
        for r in dedup.decontaminate(train, bench, ngram_k=5).collect()
    )
    assert kept == [12, 13]
    report = {
        r.doc_id: r.matched_grams
        for r in dedup.contamination_matches(train, bench, ngram_k=5).collect()
    }
    assert report == {11: 1}


def test_decontaminate_min_matches_threshold(spark):
    bench = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    # shares exactly two distinct 5-grams ("one..five" and "two..six")
    train = spark.createDataFrame(
        [(21, "one two three four five six UNSHARED eight nine ten")],
        "doc_id long, text string",
    )
    n1 = dedup.decontaminate(train, bench, ngram_k=5, min_matches=3).count()
    n2 = dedup.decontaminate(train, bench, ngram_k=5, min_matches=2).count()
    assert (n1, n2) == (1, 0)


def test_contamination_bloom_prefilter_is_exact(spark):
    """The corpus-scale regime (benchmark too big to broadcast exactly):
    a Bloom prefilter on the corpus gram stream changes NOTHING about the
    result — no false negatives, and the exact join removes the Bloom's
    false positives — for both contamination_matches and decontaminate."""
    import random

    rng = random.Random(5)
    words = [f"w{i}" for i in range(300)]
    bench = spark.createDataFrame(
        [
            (i, " ".join(rng.choice(words) for _ in range(30)))
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    texts = []
    for i in range(120):
        t = " ".join(rng.choice(words) for _ in range(40))
        texts.append((100 + i, t))
    # plant verbatim benchmark 13-grams into a third of the corpus docs
    bench_rows = bench.collect()
    for j in range(0, 120, 3):
        src = bench_rows[j % 40].text.split()[:13]
        texts[j] = (texts[j][0], texts[j][1] + " " + " ".join(src))
    train = spark.createDataFrame(texts, "doc_id long, text string")

    grams = dedup.benchmark_grams(bench).cache()
    m, k = 1 << 14, 5
    bloom = dedup.benchmark_bloom(grams, m, k)
    base = {
        (r.doc_id, r.matched_grams)
        for r in dedup.contamination_matches(
            train, None, broadcast_benchmark=False, bench_grams=grams
        ).collect()
    }
    assert base  # the planted grams were detected at all
    with_bloom = {
        (r.doc_id, r.matched_grams)
        for r in dedup.contamination_matches(
            train,
            None,
            broadcast_benchmark=False,
            bench_grams=grams,
            bench_bloom=bloom,
            bloom_bits=m,
            bloom_hashes=k,
        ).collect()
    }
    assert with_bloom == base
    kept_base = {
        r.doc_id
        for r in dedup.decontaminate(
            train, None, broadcast_benchmark=False, bench_grams=grams
        ).collect()
    }
    kept_bloom = {
        r.doc_id
        for r in dedup.decontaminate(
            train,
            None,
            broadcast_benchmark=False,
            bench_grams=grams,
            bench_bloom=bloom,
            bloom_bits=m,
            bloom_hashes=k,
        ).collect()
    }
    assert kept_bloom == kept_base
    grams.unpersist()


def test_decontaminate_md5_matches_xxhash(spark):
    bench = spark.createDataFrame(
        [(1, "shared run of tokens appearing in both corpora exactly once")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (31, "noise shared run of tokens appearing in both corpora too"),
            (32, "nothing in common here whatsoever believe me truly"),
        ],
        "doc_id long, text string",
    )
    for method in ("xxhash64", "md5"):
        kept = sorted(
            r.doc_id
            for r in dedup.decontaminate(
                train, bench, ngram_k=6, hash_method=method
            ).collect()
        )
        assert kept == [32], method


def test_ivf_lsh_hybrid_recall_and_pruning(spark):
    from data_engineering_task_adtech_data_pipeline_spark.sources.readers import Testdata

    emb = Testdata(spark, "/root/testdata/sf0.01").embeddings
    q = emb.where(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.corpus_id)
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    }
    hybrid = similarity.ivf_lsh_topk(emb, q, k=5, dim=64).collect()
    hset = {(r.query_id, r.corpus_id) for r in hybrid}
    assert len(hset & exact) / len(exact) >= 0.8
    # determinism: same call, same result (trained state must be reproducible)
    again = {
        (r.query_id, r.corpus_id)
        for r in similarity.ivf_lsh_topk(emb, q, k=5, dim=64).collect()
    }
    assert hset == again
    # the hamming prune must be a strict subset of the plain-IVF candidates:
    # every hybrid hit also appears in ivf_topk at the same k only if it
    # survived pruning, and a tighter max_hamming can only shrink the result
    tight = similarity.ivf_lsh_topk(emb, q, k=5, dim=64, max_hamming=4)
    assert tight.count() <= len(hybrid)


def test_redact_pii_counts_and_tokens(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d@e-f.org, call +1-212-555-0199, "
                "ssn 123-45-6789, host 10.0.0.1"),
            (2, "no pii here at all"),
            # round-3 VERDICT missing #2: common US formats without a +
            (3, "office (555) 123-4567 or cell 555-123-4567"),
            (4, "ssn 123-45-6789 next to phone 555-123-4567"),
        ],
        "id long, text string",
    )
    rows = {r.id: r for r in text.redact_pii(df).collect()}
    r1 = rows[1]
    assert (r1.n_email, r1.n_phone, r1.n_ssn, r1.n_ip) == (2, 1, 1, 1)
    assert r1.text_redacted == (
        "mail [EMAIL] and [EMAIL], call [PHONE], ssn [SSN], host [IP]"
    )
    r2 = rows[2]
    assert (r2.n_email, r2.n_phone, r2.n_ssn, r2.n_ip) == (0, 0, 0, 0)
    assert r2.text_redacted == r2.text
    r3 = rows[3]
    assert (r3.n_phone, r3.n_ssn) == (2, 0)
    assert r3.text_redacted == "office [PHONE] or cell [PHONE]"
    r4 = rows[4]  # SSN-shaped 3-2-4 run still classifies as SSN
    assert (r4.n_phone, r4.n_ssn) == (1, 1)
    assert r4.text_redacted == "ssn [SSN] next to phone [PHONE]"


def test_bigram_novelty_ground_truth(spark):
    # corpus bigram counts: "a b" x3 (docs 1,1,2), "b a" x1, "b c" x1
    df = spark.createDataFrame(
        [
            (1, "a b a b"),   # bigrams: "a b", "b a", "a b"
            (2, "a b c"),     # bigrams: "a b", "b c"
            (3, "x"),         # too short: no bigrams, no output row
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.bigram_novelty(df, common_min=3).collect()}
    assert set(out) == {1, 2}
    assert (out[1].n_bigrams, out[1].n_rare, out[1].n_common) == (3, 1, 2)
    assert (out[2].n_bigrams, out[2].n_rare, out[2].n_common) == (2, 1, 1)
    assert out[2].rare_ratio == 0.5


def test_winnow_fingerprints_guarantee_and_shape(spark):
    """Winnowing's core guarantee: two documents sharing a substring of
    >= k + window - 1 tokens share at least one fingerprint; disjoint
    documents share none. Short docs: < k words -> no fingerprints,
    < window grams -> exactly one (the global min)."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        winnow_fingerprints,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    df = spark.createDataFrame(
        [
            (1, f"intro words here {shared} and a closing tail"),
            (2, f"{shared} completely different continuation text"),
            (3, "nothing in common with the others at all whatsoever"),
            (4, "too short"),                     # < k words -> none
            (5, "exactly five tokens right here"),  # 1 gram -> global min
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, k=5, window=4)
    by_doc: dict[int, set] = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    # shared 8-token run >= k + window - 1 = 8 -> overlap guaranteed
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3])
    assert 4 not in by_doc
    assert len(by_doc[5]) == 1
    # md5 mode selects identically (same grams, portable hash family)
    md5_fps = winnow_fingerprints(df, k=5, window=4, hash_method="md5")
    md5_docs = {r.doc_id for r in md5_fps.collect()}
    assert 4 not in md5_docs and {1, 2, 3, 5} <= md5_docs


def test_resize_images_stub_contract(spark):
    """resize_images: fake mode passes payloads through and stamps the new
    dimensions into meta; real mode raises inside the executor batch."""
    media = spark.createDataFrame(
        [(1, bytearray(b"imgbytes")), (2, None)], "media_id long, payload binary"
    )
    media = multimodal.attach_meta(media, modality="image", mime="image/fake")
    out = {r.media_id: r for r in
           multimodal.resize_images(media, 224, 224, fake=True).collect()}
    assert bytes(out[1].payload) == b"imgbytes"
    assert (out[1].meta.width, out[1].meta.height) == (224, 224)
    assert out[1].meta.n_bytes == 8  # original meta fields carried through
    assert out[2].payload is None
    with pytest.raises(Exception):
        multimodal.resize_images(media, 224, 224, fake=False).collect()


def test_minhash_dedup_persist_profile_equivalent(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plain = {r.doc_id for r in dedup.minhash_dedup(
        df, verify_threshold=0.5).collect()}
    persisted = {r.doc_id for r in dedup.minhash_dedup(
        df, verify_threshold=0.5, persist_profile=True).collect()}
    assert plain == persisted == {1, 4, 5}


def test_winnow_partitioning_invariant(spark):
    """Fingerprint selection is a pure function of each document — same
    output on any input partitioning."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        winnow_fingerprints,
    )
    from data_engineering_task_adtech_data_pipeline_spark.sources.readers import (
        Testdata,
    )
    from conftest import SF_ORACLE

    docs = Testdata(spark, SF_ORACLE).documents.limit(100)
    a = {(r.doc_id, r.fingerprint)
         for r in winnow_fingerprints(docs, hash_method="md5").collect()}
    b = {(r.doc_id, r.fingerprint)
         for r in winnow_fingerprints(
             docs.repartition(13), hash_method="md5").collect()}
    assert a == b and a


def test_winnow_candidates_finds_shared_run(spark):
    """Pairs sharing a >= k+window-1 token run are guaranteed candidates;
    disjoint docs never pair; id_a < id_b with a shared_fps count."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        winnow_candidates,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    df = spark.createDataFrame(
        [
            (1, f"prefix one {shared} suffix one"),
            (2, f"{shared} something else entirely here"),
            (3, "unrelated content with zero overlap whatsoever present"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b): r.shared_fps
             for r in winnow_candidates(df, k=5, window=4).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert not any(3 in p for p in pairs)


def test_greedy_auto_shard_survives_order_key_ties(spark):
    """ADVICE r4: hashing the order key alone would funnel all tied rows
    (e.g. one date) into a single shard, recreating the unbounded pandas
    group auto-shard exists to prevent. The shard hash is (order, id), so
    a constant order key still spreads ~evenly; within-shard sort keeps
    (order, id) greedy order deterministic."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.chunking import (
        pack_documents_greedy,
    )

    df = spark.range(40_000).select(
        F.col("id").alias("doc_id"),
        F.lit("2026-01-01").alias("day"),  # one value: total order-key tie
        (F.col("id") % 60 + 1).alias("n_tokens"),
    )
    out = pack_documents_greedy(
        df, bin_tokens=256, order_col="day", target_shard_rows=10_000
    )
    counts = {
        r.pack_shard: r.cnt
        for r in out.groupBy("pack_shard").agg(F.count("*").alias("cnt")).collect()
    }
    assert len(counts) == 4  # ceil(40k/10k) shards all populated
    assert max(counts.values()) < 2 * 10_000  # no shard collapses the bound


def test_greedy_md5_shard_hash_matches_xxhash_semantics(spark):
    """shard_hash_method='md5' (the oracle-portable family) must keep all
    greedy invariants; only the shard ASSIGNMENT differs from xxhash64."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.chunking import (
        pack_documents_greedy,
    )

    df = spark.range(5_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 60 + 1).alias("n_tokens")
    )
    out = pack_documents_greedy(
        df, bin_tokens=256, target_shard_rows=1_000, shard_hash_method="md5"
    )
    rows = out.collect()
    assert len(rows) == 5_000
    assert len({r.pack_shard for r in rows}) == 5
    by_bin: dict[tuple, list] = {}
    for r in rows:
        by_bin.setdefault((r.pack_shard, r.bin_id), []).append(r)
    for members in by_bin.values():
        members.sort(key=lambda r: r.bin_offset)
        fill = 0
        for m in members:
            assert m.bin_offset == fill
            fill += m.n_tokens
        assert fill <= 256 or len(members) == 1
    import pytest

    with pytest.raises(ValueError, match="shard_hash_method"):
        pack_documents_greedy(
            df, bin_tokens=256, target_shard_rows=1_000, shard_hash_method="sha9"
        )


def test_profile_cache_releases_persisted_profile(spark):
    """ADVICE r4: persist_profile had no unpersist path — repeated dedup
    calls accumulated cached RDDs for the session lifetime. ProfileCache
    tracks what the operator persists and releases it deterministically."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        ProfileCache,
        minhash_dedup,
    )

    rows = [(i, f"common shingle text body number {i % 7} padding words") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with ProfileCache() as pc:
        kept = minhash_dedup(
            df, num_hashes=16, bands=8, persist_profile=True, profile_cache=pc
        )
        assert kept.count() > 0
        assert len(pc._frames) == 1
        assert pc._frames[0].storageLevel.useMemory  # persisted inside scope
        handle = pc._frames[0]
    assert not handle.storageLevel.useMemory  # released on scope exit
    assert pc._frames == []


def test_duplicate_spans_and_cut(spark):
    """Span-level dedup end-to-end: shared boilerplate inside otherwise
    unique docs is found as one maximal span per doc; cut_spans keep=first
    retains exactly one occurrence (min doc id), keep=none cuts all."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        cut_spans,
        duplicate_spans,
    )

    rows = [
        (1, "intro one STANDARD LICENSE HEADER TEXT BLOCK words tail a"),
        (2, "different start standard license header text block words closing"),
        (3, "totally clean document nothing shared with any other entry"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sp = duplicate_spans(df, k=6, min_docs=2)
    got = {r.doc_id: (r.start_word, r.end_word, r.n_grams) for r in sp.collect()}
    # 7 shared words ("standard license header text block words" + one
    # neighbour differs) -> span of the 6+1 overlap region in each doc
    assert set(got) == {1, 2}
    for d, (a, b, ng) in got.items():
        assert b - a >= 6 and ng >= 1

    first = {r.doc_id: r.text for r in cut_spans(df, sp, keep="first").collect()}
    none = {r.doc_id: r.text for r in cut_spans(df, sp, keep="none").collect()}
    assert "standard license header" in first[1]  # survives in min doc
    assert "standard license header" not in first[2]
    assert "standard license header" not in none[1]
    assert "standard license header" not in none[2]
    assert none[3] == rows[2][1].lower()  # untouched (normalized) passthrough
    # non-span words survive every policy
    assert "different start" in first[2] and "closing" in first[2]


def test_cut_spans_rejects_unknown_policy(spark):
    import pytest

    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        cut_spans,
        duplicate_spans,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    sp = duplicate_spans(df, k=2)
    with pytest.raises(ValueError, match="keep policy"):
        cut_spans(df, sp, keep="both")


def test_duplicate_spans_persist_rows_equivalent_and_released(spark):
    """persist_rows=True (the real-corpus default per SCALING.md) must be
    result-identical to recompute, and ProfileCache must release the
    cached gram rows deterministically."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        ProfileCache,
        duplicate_spans,
    )

    rows = [(i, f"shared run of words here tail {i % 4} pad{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = sorted(map(tuple, duplicate_spans(df, k=4, min_docs=2).collect()))
    with ProfileCache() as pc:
        fast = sorted(
            map(
                tuple,
                duplicate_spans(
                    df, k=4, min_docs=2, persist_rows=True, profile_cache=pc
                ).collect(),
            )
        )
        assert len(pc._frames) == 1
        handle = pc._frames[0]
        assert handle.storageLevel.useMemory
    assert fast == base
    assert not handle.storageLevel.useMemory


# --- HyperLogLog sketch ----------------------------------------------------


def test_hll_accuracy_and_partition_invariance(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators import sketch

    # three groups of known cardinality (values overlap across groups on
    # purpose: sketches are per-group)
    base = spark.range(20_000).select(
        F.lit("big").alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    mid = spark.range(2_000).select(
        F.lit("mid").alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    small = spark.range(50).select(
        F.lit("small").alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    df = base.unionByName(mid).unionByName(small)
    for method in ("xxhash64", "md5"):
        est = {
            r.g: r.est_distinct
            for r in sketch.hll_distinct(df, "v", ["g"], p=10, method=method).collect()
        }
        for g, n in (("big", 20_000), ("mid", 2_000), ("small", 50)):
            # standard error ~1.04/sqrt(1024) ~ 3.3%; allow 5 sigma
            assert abs(est[g] - n) / n < 0.17, (method, g, est[g])
    # pure function of the data
    a = sketch.hll_distinct(df, "v", ["g"], p=10).collect()
    b = sketch.hll_distinct(df.repartition(37), "v", ["g"], p=10).collect()
    assert {(r.g, r.est_distinct) for r in a} == {(r.g, r.est_distinct) for r in b}


def test_hll_merge_is_lossless(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators import sketch

    df = spark.range(10_000).select(
        F.lit("g").alias("g"), F.concat(F.lit("x"), F.col("id")).alias("v")
    )
    # overlapping halves: dedup must happen inside the sketch merge
    h1 = df.where(F.col("id") < 6_000)
    h2 = df.where(F.col("id") >= 3_000)
    whole = sketch.hll_registers(df, "v", ["g"], p=8)
    merged = sketch.hll_merge(
        [
            sketch.hll_registers(h1, "v", ["g"], p=8),
            sketch.hll_registers(h2, "v", ["g"], p=8),
        ],
        ["g"],
    )
    assert {(r.g, r.bucket, r.rho) for r in whole.collect()} == {
        (r.g, r.bucket, r.rho) for r in merged.collect()
    }
    e1 = sketch.hll_estimate(whole, ["g"], p=8).collect()[0].est_distinct
    e2 = sketch.hll_estimate(merged, ["g"], p=8).collect()[0].est_distinct
    assert e1 == e2


def test_hll_small_range_correction_and_plan(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators import sketch

    # tiny cardinality vs m=1024 -> linear-counting branch; should be
    # near-exact (every value lands in its own register w.h.p.)
    df = spark.range(30).select(
        F.lit("g").alias("g"), F.concat(F.lit("y"), F.col("id")).alias("v")
    )
    est = sketch.hll_distinct(df, "v", ["g"], p=10).collect()[0].est_distinct
    assert abs(est - 30) <= 2
    # register build is ONE partial-aggregating shuffle: a single Exchange
    # (plus AQE reads), no window, no sort-based fallback
    plan = (
        sketch.hll_registers(df, "v", ["g"], p=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_tfidf_topk_hand_example(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators import text as T

    df = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian"),
        ],
        "doc_id int, text string",
    )
    out = {
        (r.doc_id, r.term): (r.tf, r.df, round(r.tfidf, 6), r.rnk)
        for r in T.tfidf_topk(df, k=2).collect()
    }
    import math

    def idf(dfreq):
        return round(math.log(4.0 / (1.0 + dfreq)) + 1.0, 6)

    # doc 1: apple tf=2 df=1 beats banana tf=1 df=2
    assert out[(1, "apple")] == (2, 1, round(2 * idf(1), 6), 1)
    assert out[(1, "banana")][3] == 2
    # doc 3: cherry tf=2 df=2; durian tf=1 df=1 -> cherry wins on tf*idf
    assert out[(3, "cherry")][3] == (
        1 if 2 * idf(2) > 1 * idf(1) else 2
    )
    assert len([k for k in out if k[0] == 2]) == 2


def test_bloom_no_false_negatives_and_fpr(spark):
    """Every inserted key passes ("maybe" is a superset of the true set —
    a Bloom filter has no false negatives), misses are exact, and the
    measured false-positive rate stays near (1-e^(-kn/m))^k — for both
    hash families."""
    import math

    from data_engineering_task_adtech_data_pipeline_spark.operators import sketch

    n, m, k = 2000, 1 << 15, 5
    members = spark.range(n).select(
        F.concat(F.lit("key-"), F.col("id")).alias("v")
    )
    probes = spark.range(10_000, 14_000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("v")
    )
    for method in ("xxhash64", "md5"):
        bloom = sketch.bloom_sketch(members, "v", m, k, method)
        kept = sketch.bloom_filter_rows(
            members, bloom, "v", m, k, method, keep="maybe"
        )
        assert kept.count() == n, method  # no false negatives
        fp = sketch.bloom_filter_rows(
            probes, bloom, "v", m, k, method, keep="maybe"
        ).count()
        theory = (1.0 - math.exp(-k * n / m)) ** k
        assert fp / 4000 <= 3 * theory + 0.01, (method, fp)
        # "miss" is the exact complement of "maybe" on the same probe set
        miss = sketch.bloom_filter_rows(
            probes, bloom, "v", m, k, method, keep="miss"
        ).count()
        assert miss + fp == 4000, method
    with pytest.raises(ValueError):
        sketch.bloom_filter_rows(probes, bloom, "v", m, k, keep="all")
    with pytest.raises(ValueError):
        sketch.bloom_sketch(members, "v", m, k, method="sha9")


def test_bloom_merge_equals_single_build(spark):
    """bloom_merge(sketch(A), sketch(B)) is BIT-IDENTICAL to
    sketch(A ∪ B) — the merge law that lets per-day/per-source filters
    compose without raw data."""
    from data_engineering_task_adtech_data_pipeline_spark.operators import sketch

    m, k = 1 << 12, 4
    a = spark.range(0, 500).select(F.concat(F.lit("a-"), F.col("id")).alias("v"))
    b = spark.range(300, 900).select(F.concat(F.lit("a-"), F.col("id")).alias("v"))
    merged = {
        (r.word, r.bits)
        for r in sketch.bloom_merge(
            sketch.bloom_sketch(a, "v", m, k), sketch.bloom_sketch(b, "v", m, k)
        ).collect()
    }
    single = {
        (r.word, r.bits)
        for r in sketch.bloom_sketch(a.unionByName(b), "v", m, k).collect()
    }
    assert merged == single
    with pytest.raises(ValueError):
        sketch.bloom_merge()


def test_bloom_prefilter_preserves_exact_semi_join(spark):
    """The 100 TB pattern: bloom-prefilter the big probe side, then the
    exact join — result equals the exact join alone, while the probe plan
    stays broadcast-only (no shuffle of the probe side before the filter)."""
    from data_engineering_task_adtech_data_pipeline_spark.operators import sketch

    big = spark.range(0, 5000).select(
        F.concat(F.lit("g-"), (F.col("id") % 700)).alias("g"),
        F.col("id").alias("row_id"),
    )
    small = spark.range(0, 50).select(
        F.concat(F.lit("g-"), (F.col("id") * 7)).alias("g")
    )
    m, k = 1 << 12, 5
    bloom = sketch.bloom_sketch(small, "g", m, k)
    pre = sketch.bloom_filter_rows(big, bloom, "g", m, k, keep="maybe")
    exact_pre = {
        r.row_id for r in pre.join(small.distinct(), "g").collect()
    }
    exact = {r.row_id for r in big.join(small.distinct(), "g").collect()}
    assert exact_pre == exact
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_cm_sketch_overestimates_and_merges(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators import sketch

    # zipf-ish: value k appears ~ 3000/k times
    df = spark.range(1, 120).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), (F.lit(3000) / F.col("id")).cast("int")),
                lambda i: F.concat(F.lit("t"), F.col("id")),
            )
        ).alias("v")
    )
    exact = df.groupBy("v").agg(F.count(F.lit(1)).alias("exact_cnt"))
    for method in ("xxhash64", "md5"):
        sk = sketch.cm_sketch(df, "v", d=4, w=1024, method=method)
        est = sketch.cm_estimate(sk, exact, "v", d=4, w=1024, method=method)
        rows = est.collect()
        n = df.count()
        for r in rows:
            assert r.est_cnt >= r.exact_cnt, (method, r)  # never under
            # eps = e/w; allow 5x slack on the w.h.p. bound
            assert r.est_cnt - r.exact_cnt <= 5 * 2.718 * n / 1024, (method, r)
    # merge additivity: sketch(A ⊎ B) == merge over halves, exactly
    h1 = df.limit(0).unionByName(df).where(F.length("v") <= 2)
    h2 = df.where(F.length("v") > 2)
    whole = sketch.cm_sketch(df, "v", d=2, w=256)
    merged = sketch.cm_merge(
        [sketch.cm_sketch(h1, "v", d=2, w=256), sketch.cm_sketch(h2, "v", d=2, w=256)]
    )
    assert {(r.j, r.col, r.cnt) for r in whole.collect()} == {
        (r.j, r.col, r.cnt) for r in merged.collect()
    }


def test_collapse_duplicates_keeps_best_per_cluster(spark):
    """The transitive chain collapses to ONE kept row — the highest-score
    member, not the min id — and carries cluster label (min id) + size;
    singletons keep themselves with size 1."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        collapse_duplicates,
        minhash_dedup_transitive,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank today ok", 10),
            (2, "the quick brown fox jumps over the lazy dog near the river bank tonight ok", 99),
            (3, "a quick brown fox jumps over the lazy dog near the river bank tonight ok", 50),
            (4, "completely different content about spark query engines and shuffles", 7),
        ],
        "doc_id long, text string, score long",
    )
    out = {r.doc_id: r for r in
           collapse_duplicates(docs, "score", verify_threshold=0.5).collect()}
    # chain 1~2~3 is one cluster labeled 1; doc 2 wins on score
    assert set(out) == {2, 4}
    assert (out[2].cluster, out[2].cluster_size) == (1, 3)
    assert (out[4].cluster, out[4].cluster_size) == (4, 1)
    # same clustering decision as minhash_dedup_transitive (which keeps min id)
    min_id_kept = sorted(
        r.doc_id
        for r in minhash_dedup_transitive(docs, verify_threshold=0.5).collect()
    )
    assert min_id_kept == [1, 4]
    # cc strategies agree
    out_prop = {r.doc_id: (r.cluster, r.cluster_size) for r in
                collapse_duplicates(docs, "score", verify_threshold=0.5,
                                    cc="propagation").collect()}
    assert out_prop == {k: (v.cluster, v.cluster_size) for k, v in out.items()}


def test_collapse_duplicates_rejects_unknown_cc(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        collapse_duplicates,
    )
    import pytest

    docs = spark.createDataFrame([(1, "a b c", 1)],
                                 "doc_id long, text string, score long")
    with pytest.raises(ValueError, match="unknown cc"):
        collapse_duplicates(docs, "score", cc="bogus").collect()


def test_semantic_dedup_flags_smaller_id_wins(spark):
    """Identical/near-identical vectors in one cell: every copy except the
    smallest id is flagged; distinct directions survive; partition-
    invariant; a pre-trained centroid model short-circuits training."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.similarity import (
        kmeans_fit,
        semantic_dedup,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # ~ dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.999, 0.01, 0.0]),   # ~ dup of 3
        (5, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in
           semantic_dedup(df, threshold=0.95, n_cells=2, n_iter=2,
                          dim=4).collect()}
    assert len(out) == 5
    assert not out[1].is_dup and out[2].is_dup
    assert not out[3].is_dup and out[4].is_dup
    assert not out[5].is_dup
    # partition invariance (pure function of the data)
    out2 = {(r.vec_id, r.cell, r.is_dup) for r in
            semantic_dedup(df.repartition(7), threshold=0.95, n_cells=2,
                           n_iter=2, dim=4).collect()}
    assert out2 == {(k, v.cell, v.is_dup) for k, v in out.items()}
    # reusing a trained model gives the same answer as training in-line
    model = kmeans_fit(df, n_cells=2, n_iter=2, dim=4)
    out3 = {(r.vec_id, r.cell, r.is_dup) for r in
            semantic_dedup(df, threshold=0.95, centroids=model).collect()}
    assert out3 == out2


def test_dedup_against_corpus_drops_only_matched_batch_rows(spark):
    """Batch rows near-duplicating a corpus row are dropped; novel batch
    rows and within-batch duplicates survive (incremental contract); the
    corpus itself is never returned."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        dedup_against,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank today ok"),
            (2, "completely different content about spark query engines and shuffles"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog near the river bank tonight ok"),  # ~ corpus 1
            (11, "novel text that shares nothing with anything else in this corpus at all"),
            (12, "novel text that shares nothing with anything else in this corpus at all"),  # dup of 11: must SURVIVE
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id
        for r in dedup_against(batch, corpus, verify_threshold=0.5).collect()
    )
    assert kept == [11, 12]
    # verify_threshold=None: any shared band drops (10 still goes)
    kept_nb = sorted(
        r.doc_id
        for r in dedup_against(batch, corpus, verify_threshold=None).collect()
    )
    assert 10 not in kept_nb and 11 in kept_nb


def test_inverted_index_postings_and_cap(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        inverted_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma"),
            (2, "alpha gamma gamma"),
            (3, "alpha delta"),
        ],
        "doc_id long, text string",
    )
    out = {r.term: r for r in inverted_index(docs).collect()}
    assert out["alpha"].df == 3 and out["alpha"].tf_total == 3
    assert list(out["alpha"].postings) == [1, 2, 3]
    assert out["beta"].df == 1 and out["beta"].tf_total == 2
    assert out["gamma"].df == 2 and out["gamma"].tf_total == 3
    # cap truncates the list but keeps exact counts
    capped = {r.term: r for r in
              inverted_index(docs, max_postings=2).collect()}
    assert list(capped["alpha"].postings) == [1, 2]
    assert capped["alpha"].df == 3  # truncation visible: df > len(postings)
    # min_df drops hapax terms
    filtered = {r.term for r in inverted_index(docs, min_df=2).collect()}
    assert filtered == {"alpha", "gamma"}


def test_bm25_hand_example(spark):
    """BM25 sanity on a 3-doc corpus: rarer term dominates, tf saturates,
    longer docs are penalized, unmatched docs absent."""
    import math

    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        bm25_scores,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "apple cherry cherry cherry cherry cherry"),
            (3, "durian elderberry fig"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "apple"), (2, "banana")],
                              "query_id int, term string")
    out = {(r.query_id, r.doc_id): r for r in
           bm25_scores(docs, q, k=None).collect()}
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    # doc 1: tf=2 in len 3; doc 2: tf=1 in len 6 -> doc 1 scores higher
    assert out[(1, 1)].score > out[(1, 2)].score
    # banana idf (df=1) > apple idf (df=2): check the idf factor directly
    idf_banana = round(math.log(1 + (3 - 1 + 0.5) / (1 + 0.5)), 6)
    # doc1: dl=3, avgdl=4.0, tf=1
    expect = round(idf_banana * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 3 / 4.0)), 6)
    assert abs(out[(2, 1)].score - expect) < 1e-9
    # top-k path returns ranked rows
    ranked = {(r.query_id, r.rnk): r.doc_id for r in
              bm25_scores(docs, q, k=1).collect()}
    assert ranked == {(1, 1): 1, (2, 1): 1}


def test_corpus_datacard_hand_example(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        corpus_datacard,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog in the house is that so", "a"),
            (2, "the cat and the dog in the house is that so", "a"),  # exact dup
            (3, "x y z", "a"),
            (4, "el la de que los las una por si no", "b"),
        ],
        "doc_id long, text string, source string",
    )
    out = {(r.source, r.lang_pred): r for r in
           corpus_datacard(docs, short_words=5).collect()}
    en = out[("a", "en")]
    assert en.n_docs == 2 and en.n_distinct_content == 1  # dup collapsed
    assert en.total_words == 22 and en.mean_doc_words == 11.0
    assert en.pct_short == 0.0
    assert out[("a", "und")].n_docs == 1
    assert out[("a", "und")].pct_short == 1.0  # 3 words < 5
    assert ("b", "es") in out


def test_rank_metrics_hand_example(spark):
    """Known-answer IR metrics: hits/recall/precision/MRR/NDCG on a tiny
    ranked list, including the zero-hit and missing-query branches."""
    import math

    from data_engineering_task_adtech_data_pipeline_spark.operators.evaluation import (
        rank_metrics,
    )

    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (3, 30, 1)],
        "query_id int, corpus_id long, rank int",
    )
    truth = spark.createDataFrame(
        # q1: relevant {11, 12, 99} -> hits at ranks 2,3; q2: none of the
        # results relevant; q4: truth but NO results at all
        [(1, 11), (1, 12), (1, 99), (2, 21), (4, 40)],
        "query_id int, corpus_id long",
    )
    out = {r.query_id: r for r in rank_metrics(results, truth, k=3).collect()}
    assert set(out) == {1, 2, 4}  # q3 has results but no truth -> dropped
    r1 = out[1]
    assert (r1.n_rel, r1.hits) == (3, 2)
    assert abs(r1.recall_at_k - 2 / 3) < 1e-12
    assert r1.precision_at_k == 2 / 3 and r1.mrr == 0.5
    dcg = round(1 / math.log2(3), 6) + round(1 / math.log2(4), 6)
    idcg = round(1 / math.log2(2), 6) + round(1 / math.log2(3), 6) + round(
        1 / math.log2(4), 6
    )
    assert abs(r1.ndcg - dcg / idcg) < 1e-9
    assert (out[2].hits, out[2].mrr, out[2].ndcg) == (0, 0.0, 0.0)
    assert (out[4].hits, out[4].recall_at_k) == (0, 0.0)


def test_bpe_pair_counts_hand_example(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        bpe_pair_counts,
    )

    docs = spark.createDataFrame(
        [(1, "aba ab"), (2, "aba x")], "doc_id long, text string"
    )
    out = {(r.left_sym, r.right_sym): r.pair_count for r in
           bpe_pair_counts(docs).collect()}
    # 'aba' (freq 2) contributes one (a,b) and one (b,a) pair per word;
    # 'ab' (freq 1) one (a,b); 'x' is single-char -> no pairs
    assert out == {("a", "b"): 3, ("b", "a"): 2}


def test_zipf_fit_properties(spark):
    """A geometric frequency corpus gives an exact known slope; the fit is
    partition-invariant and supports per-group output."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        zipf_fit,
    )

    # construct a corpus where term tN appears ceil(64 / 2^N)-ish times:
    # freq halves per rank step -> ln(freq) vs ln(rank) is NOT linear,
    # but slope must be negative and r2 in (0, 1]
    rows = []
    i = 0
    for n, freq in enumerate([64, 32, 16, 8, 4, 2, 1]):
        for _ in range(freq):
            rows.append((i, f"t{n}", "s"))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = zipf_fit(df, top_n=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_terms == 7 and r.slope < 0 and 0 < r.r2 <= 1.0
    out2 = zipf_fit(df.repartition(9), top_n=10).collect()[0]
    assert (out2.slope, out2.intercept, out2.r2) == (r.slope, r.intercept, r.r2)
    by_src = {row.source: row for row in
              zipf_fit(df, top_n=10, group_cols=("source",)).collect()}
    assert by_src["s"].slope == r.slope


def test_validate_rules_and_uniqueness(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators import validate as V

    df = spark.createDataFrame(
        [
            (1, "en", 10),
            (1, "en", 20),        # duplicate id
            (2, None, -5),        # null lang (passes accepted), range viol
            (3, "xx", 10),        # bad lang
            (None, "en", 10),     # null id
        ],
        "doc_id long, lang string, n int",
    )
    out = {r.rule: r.violations for r in V.validate(
        df,
        rules={
            "id_not_null": V.not_null("doc_id"),
            "n_in_range": V.in_range("n", 0, 100),
            "lang_ok": V.accepted_values("lang", ["en", "es"]),
        },
        unique={"id_unique": ["doc_id"]},
    ).collect()}
    # id_unique = count(*) - count(DISTINCT id) = 5 - 3: the duplicate id
    # AND the null id both count (NULL is never a unique key; both engines'
    # COUNT(DISTINCT) ignore NULLs identically)
    assert out == {
        "id_not_null": 1, "n_in_range": 1, "lang_ok": 1, "id_unique": 2
    }
    import pytest

    with pytest.raises(ValueError, match="no rules"):
        V.validate(df, rules={})


def test_snapshot_diff_classification(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.validate import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C!"), (4, "d")], "doc_id long, text string"
    )
    out = {r.doc_id: r.change for r in snapshot_diff(old, new).collect()}
    assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def _ppm_bytes(w, h, rgb):
    import numpy as np

    arr = np.zeros((h, w, 3), np.uint8)
    arr[:, :] = rgb
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + arr.tobytes()


def test_decode_images_real_ppm_and_bmp(spark):
    """fake=False really decodes PPM(P6) and 24-bit BMP payloads with the
    hand-rolled numpy parsers (r5 verdict #6): features carry true
    (width, height, channel means/stds); corrupt supported-format payloads
    yield decode_ok=False instead of failing the batch."""
    import numpy as np

    from data_engineering_task_adtech_data_pipeline_spark.operators.multimodal import (
        _bmp_encode,
    )

    ppm = _ppm_bytes(4, 2, (10, 200, 30))
    arr = np.zeros((3, 5, 3), np.uint8)
    arr[:, :] = (7, 8, 9)
    bmp = _bmp_encode(arr)  # width 5 -> stride padding exercised
    corrupt = b"P6\n4 2\n255\n\x00"  # truncated raster
    media = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(bmp)), (3, bytearray(corrupt))],
        "media_id long, payload binary",
    )
    feats = {r.media_id: r for r in
             multimodal.decode_images(media, fake=False).collect()}
    assert feats[1].decode_ok
    assert feats[1].feature[:5] == [4.0, 2.0, 10.0, 200.0, 30.0]
    assert feats[1].feature[5:] == [0.0, 0.0, 0.0]  # uniform -> zero std
    assert feats[2].decode_ok
    assert feats[2].feature[:5] == [5.0, 3.0, 7.0, 8.0, 9.0]
    assert not feats[3].decode_ok and feats[3].feature is None


def test_resize_images_real_roundtrip(spark):
    """fake=False resize: decode -> nearest-neighbor resample -> re-encode
    in the source format; the output payload re-decodes at the new
    dimensions with the original colors preserved."""
    import numpy as np

    from data_engineering_task_adtech_data_pipeline_spark.operators.multimodal import (
        _bmp_decode,
        _bmp_encode,
        _ppm_decode,
    )

    ppm = _ppm_bytes(8, 4, (50, 60, 70))
    arr = np.zeros((4, 6, 3), np.uint8)
    arr[:, :] = (1, 2, 3)
    bmp = _bmp_encode(arr)
    media = multimodal.attach_meta(
        spark.createDataFrame(
            [(1, bytearray(ppm)), (2, bytearray(bmp))],
            "media_id long, payload binary",
        ),
        modality="image",
    )
    out = {r.media_id: r for r in
           multimodal.resize_images(media, 3, 2, fake=False).collect()}
    assert (out[1].meta.width, out[1].meta.height) == (3, 2)
    dec1 = _ppm_decode(bytes(out[1].payload))
    assert dec1.shape == (2, 3, 3) and (dec1 == (50, 60, 70)).all()
    dec2 = _bmp_decode(bytes(out[2].payload))
    assert dec2.shape == (2, 3, 3) and (dec2 == (1, 2, 3)).all()


def test_bmp_codec_roundtrip_gradient():
    """Pure-codec check: an asymmetric gradient survives BMP encode/decode
    bit-for-bit (stride padding, bottom-up row order, BGR swap all
    exercised); PPM likewise."""
    import numpy as np

    from data_engineering_task_adtech_data_pipeline_spark.operators.multimodal import (
        _bmp_decode,
        _bmp_encode,
        _ppm_decode,
        _ppm_encode,
    )

    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (_bmp_decode(_bmp_encode(arr)) == arr).all()
    assert (_ppm_decode(_ppm_encode(arr)) == arr).all()


def test_duplicate_lines_hand_example(spark):
    """Boilerplate line 'footer text' appears in 3 docs -> dropped from
    all; unique lines keep document order; a doc that is ALL boilerplate
    ends empty; intra-doc repeats of a unique line survive (df counts
    DISTINCT docs)."""
    docs = spark.createDataFrame(
        [
            (1, "alpha one\nfooter text\nbeta two"),
            (2, "gamma three\nfooter text"),
            (3, "footer text"),
            (4, "delta four\ndelta four"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.duplicate_lines(docs, min_docs=2).collect()}
    assert (out[1].n_lines, out[1].n_kept) == (3, 2)
    assert out[1].clean_text == "alpha one\nbeta two"
    assert (out[2].n_lines, out[2].n_kept) == (2, 1)
    assert out[2].clean_text == "gamma three"
    assert (out[3].n_lines, out[3].n_kept) == (1, 0)
    assert out[3].clean_text == ""
    # 'delta four' twice in ONE doc: df=1, both positions kept in order
    assert (out[4].n_lines, out[4].n_kept) == (2, 2)
    assert out[4].clean_text == "delta four\ndelta four"


def test_bpe_learn_merges_hand_example(spark):
    """'aaa' x2 gives pair (a,a) count 4 (2 adjacent pairs x freq 2);
    'low' x3 + 'lower' gives (l,o) count 4 — the tie at 4 breaks
    LEXICOGRAPHICALLY, so round 1 merges (a,a); the replace is
    left-to-right non-overlapping ('aaa' -> 'aa'+'a', so round 2's (a,a)
    count is 0 and (l,o) wins), then (lo,w)."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        bpe_learn_merges,
    )

    docs = spark.createDataFrame(
        [(1, "low low low lower"), (2, "aaa aaa")], "doc_id long, text string"
    )
    got = {r.merge_rank: r for r in bpe_learn_merges(docs, n_merges=3).collect()}
    assert (got[1].left_sym, got[1].right_sym, got[1].pair_count) == ("a", "a", 4)
    assert (got[2].left_sym, got[2].right_sym, got[2].pair_count) == ("l", "o", 4)
    assert (got[3].left_sym, got[3].right_sym, got[3].pair_count) == ("lo", "w", 4)


def test_unigram_nll_hand_example(spark):
    """p(common)=3/4, p(rare)=1/4: doc of all-common words scores
    -ln(0.75), the mixed doc averages the two; values match the closed
    form after 6-dp rounding."""
    import math

    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        unigram_nll_score,
    )

    docs = spark.createDataFrame(
        [(1, "common common"), (2, "common rare")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_nll_score(docs).collect()}
    c = round(-math.log(3 / 4), 6)
    r = round(-math.log(1 / 4), 6)
    assert out[1].n_words == 2 and abs(out[1].avg_nll - c) < 1e-9
    assert out[2].n_words == 2 and abs(out[2].avg_nll - (c + r) / 2) < 1e-9


def test_pagerank_hand_example(spark):
    """Star graph a->b, c->b, b->a (b is the hub; c is rank-source only;
    no dangling nodes) + a dangling-node variant: ranks match the closed
    form and always sum to ~1."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.graph import (
        pagerank,
    )

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("c", "b", 1.0), ("b", "a", 1.0)],
        "src string, dst string, wt double",
    )
    got = {r.node: r for r in pagerank(edges, n_iter=2, weight_col="wt").collect()}
    n = 3
    base = (1 - 0.85) / n
    # iteration 1 from uniform 1/3: b gets a+c contributions, a gets b's
    r1 = {
        "a": round(base + 0.85 * round(1 / 3, 12), 12),
        "b": round(base + 0.85 * (round(1 / 3, 12) * 2), 12),
        "c": round(base, 12),
    }
    r2b = round(base + 0.85 * (r1["a"] + r1["c"]), 12)
    assert abs(got["b"].rank - r2b) < 1e-9
    assert abs(sum(r.rank for r in got.values()) - 1.0) < 1e-6
    assert got["c"].out_weight == 1.0

    # dangling: b has no out-edges; its mass redistributes uniformly
    dangle = spark.createDataFrame(
        [("a", "b", 1.0)], "src string, dst string, wt double"
    )
    got2 = {r.node: r for r in pagerank(dangle, n_iter=3, weight_col="wt").collect()}
    assert abs(sum(r.rank for r in got2.values()) - 1.0) < 1e-6
    assert got2["b"].rank > got2["a"].rank  # b receives, a only donates


def test_pagerank_rejects_negative_weights(spark):
    """ADVICE r6 + review r7: ANY negative edge weight must be refused
    up front — including when the node's out_weight SUM stays positive
    (+2/-1) or cancels to zero (+1/-1); both corrupt rank mass silently
    if only the per-node sum is checked."""
    import pytest

    from data_engineering_task_adtech_data_pipeline_spark.operators.graph import (
        pagerank,
    )

    for rows in (
        [("a", "b", -1.0), ("b", "a", 1.0)],          # sum < 0
        [("a", "b", 2.0), ("a", "c", -1.0)],          # sum > 0, edge < 0
        [("a", "b", 1.0), ("a", "c", -1.0)],          # sum == 0 (cancel)
    ):
        edges = spark.createDataFrame(
            rows, "src string, dst string, wt double"
        )
        with pytest.raises(ValueError, match="negative edge weight"):
            pagerank(edges, n_iter=1, weight_col="wt")


def test_prefix_sum_release_persisted(spark):
    """distributed_prefix_sum registers its persisted frame; the release
    helper drains the registry, and releasing does not change results
    (recompute replays the same pinned RDD graph)."""
    from data_engineering_task_adtech_data_pipeline_spark.operators import (
        chunking,
    )

    chunking.release_persisted()  # drain anything earlier tests left
    df = spark.createDataFrame(
        [(i, (i * 7) % 13 + 1) for i in range(100)], "id long, n long"
    )
    out = chunking.distributed_prefix_sum(
        df, [F.col("id").asc()], "n", num_partitions=4
    )
    before = sorted((r["id"], r["__cum"]) for r in out.collect())
    assert chunking.release_persisted() == 1
    assert chunking.release_persisted() == 0
    # post-release re-materialization is identical
    assert sorted((r["id"], r["__cum"]) for r in out.collect()) == before


def test_bpe_tokenize_counts_hand_example(spark):
    """After merging (l,o) then (lo,w): 'low' encodes to the single token
    [low]; 'lower' to [low, e, r] (3 tokens); unmerged 'cat' stays 3
    character tokens. chars_per_token is an exact integer ratio."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        bpe_tokenize_counts,
    )

    docs = spark.createDataFrame(
        [(1, "low lower"), (2, "cat")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in
           bpe_tokenize_counts(docs, [("l", "o"), ("lo", "w")]).collect()}
    # 'low' -> l o w -> lo w -> low (1 token, 3 chars)
    # 'lower' -> lo w e r -> low e r (3 tokens, 5 chars)
    assert (out[1].n_words, out[1].n_tokens) == (2, 4)
    assert abs(out[1].chars_per_token - 8 / 4) < 1e-12
    assert (out[2].n_words, out[2].n_tokens) == (1, 3)


def test_bpe_merge_fold_boundary_and_adjacency(spark):
    """Round-6 review regression: after merging (a,b), a later (b,c)
    merge must NOT eat the 'b' inside symbol 'ab' (string replace did);
    and adjacent/overlapping occurrences must all merge greedily
    ('aaaa' + (a,a) -> [aa, aa]; 'lrlr' after (l,r) -> [lr, lr])."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        bpe_tokenize_counts,
    )

    docs = spark.createDataFrame(
        [(1, "abc"), (2, "aaaa"), (3, "lrlr")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in bpe_tokenize_counts(
        docs, [("a", "b"), ("b", "c"), ("a", "a"), ("l", "r")]
    ).collect()}
    # 'abc': (a,b) -> [ab, c]; (b,c) must not match inside 'ab' -> stays 2
    assert out[1].n_tokens == 2
    # 'aaaa': (a,a) greedy left-to-right -> [aa, aa]
    assert out[2].n_tokens == 2
    # 'lrlr': (l,r) adjacent occurrences both merge -> [lr, lr]
    assert out[3].n_tokens == 2


def test_wav_decode_hand_examples(spark):
    """Real RIFF/WAVE parsing: 16-bit mono, 8-bit recentring, stereo frame
    counting, unknown-chunk skipping with odd-size padding, corrupt
    payloads -> decode_ok False, non-RIFF -> NotImplementedError."""
    import math
    import struct

    import pytest

    from data_engineering_task_adtech_data_pipeline_spark.operators.multimodal import (
        _wav_decode,
        _wav_encode,
        decode_audio,
    )

    # 16-bit mono: stats computed by hand
    s16 = [100, -200, 300, -32768]
    wav16 = _wav_encode(s16, sample_rate=8000)
    info, samples = _wav_decode(wav16)
    assert info == {"sample_rate": 8000, "channels": 1, "bits": 16,
                    "n_frames": 4, "duration_ms": 0}
    assert samples.tolist() == s16

    # 8-bit unsigned recentres to signed
    wav8 = _wav_encode([0, 128, 255], sample_rate=4000, bits=8)
    info8, samples8 = _wav_decode(wav8)
    assert (info8["bits"], info8["n_frames"]) == (8, 3)
    assert samples8.tolist() == [-128, 0, 127]

    # stereo: 6 samples -> 3 frames; duration from frames not samples
    wavst = _wav_encode([1, 2, 3, 4, 5, 6], sample_rate=1000, channels=2)
    infost, _ = _wav_decode(wavst)
    assert (infost["channels"], infost["n_frames"], infost["duration_ms"]) \
        == (2, 3, 3)

    # unknown odd-sized chunk before fmt/data must be skipped with its
    # pad byte (RIFF word alignment)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = wav16[:12] + extra + wav16[12:]
    assert _wav_decode(spliced)[0]["n_frames"] == 4

    # corrupt: truncated data chunk; non-PCM format code
    assert _wav_decode(wav16[:-3]) is None
    nonpcm = bytearray(wav16)
    nonpcm[20] = 3  # audio_format = IEEE float
    assert _wav_decode(bytes(nonpcm)) is None

    # operator end-to-end: stats + decode_ok arms + non-RIFF raise
    df = spark.createDataFrame(
        [(1, bytearray(wav16)), (2, bytearray(wav16[:-3])), (3, None)],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in decode_audio(df).collect()}
    assert got[1].decode_ok and not got[2].decode_ok and not got[3].decode_ok
    assert got[1].peak == 32768
    expect_rms = math.sqrt(sum(x * x for x in s16) / 4)
    assert got[1].rms == expect_rms
    assert got[2].n_frames is None

    mp3ish = spark.createDataFrame(
        [(1, bytearray(b"ID3\x04\x00rest-of-an-mp3"))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="RIFF/WAVE"):
        decode_audio(mp3ish).collect()


def test_synth_wav_matches_definition(spark):
    """synth_wav's samples are the documented pure function of the text
    (the property the q98 oracle relies on)."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.multimodal import (
        _wav_decode,
        synth_wav,
    )

    df = spark.createDataFrame([(7, "ab z")], "doc_id long, text string")
    payload = bytes(synth_wav(df).collect()[0].payload)
    info, samples = _wav_decode(payload)
    expect = [((ord(c) * 257 + 7 * i) % 65536) - 32768
              for i, c in enumerate("ab z", start=1)]
    assert samples.tolist() == expect
    assert info["sample_rate"] == 8000 and info["channels"] == 1


def test_bpe_batched_equals_strict(spark):
    """batch=True must reproduce the strict one-merge-per-job loop's
    table EXACTLY (rank, symbols, counts) — on the real corpus and on
    adversarial hand cases (interacting candidates, disjoint ties, and
    counts tying at the batch bound, where the batch must degrade to
    single steps)."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        bpe_learn_merges,
    )
    from data_engineering_task_adtech_data_pipeline_spark.sources.readers import (
        Testdata,
    )
    from conftest import SF_ORACLE

    corpora = [
        Testdata(spark, SF_ORACLE).documents.select("text"),
        spark.createDataFrame(
            [(1, "x y z x y z x y")], "id long, text string"
        ),  # chained interactions: (x,y) blocks (y,z)
        spark.createDataFrame(
            [(1, "a b a b c d c d e f")], "id long, text string"
        ),  # disjoint tie (a,b)/(c,d) mergeable in one batch
        spark.createDataFrame(
            [(1, "p q p q r s r s"), (2, "q r q r")],
            "id long, text string",
        ),  # tie AT the bound: (p,q)=2,(r,s)=2,(q,r)=2 all interact via q/r
    ]
    for corpus in corpora:
        strict = [tuple(r) for r in
                  bpe_learn_merges(corpus, n_merges=5).collect()]
        batched = [tuple(r) for r in
                   bpe_learn_merges(corpus, n_merges=5, batch=True).collect()]
        assert batched == strict, (strict, batched)


# ---------------------------------------------------------------------------
# Gopher repetition gate / hybrid retrieval (round 7)
# ---------------------------------------------------------------------------


def test_gopher_gate_hand_example(spark):
    """Known word/bigram counts: 'a b a b a c' — n_words=6, distinct=3,
    chars=6, top word 'a' (3x1 chars), top bigram 'a b' (2 occurrences,
    2 chars each); dup_word_frac = 1 - 3/6 = 0.5."""
    df = spark.createDataFrame(
        [(1, "a b a b a c"), (2, "x y z w v u t s r q p o n m l k j i h g")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text.gopher_gate(df, min_words=5).collect()}
    r1 = rows[1]
    assert r1.n_words == 6
    assert float(r1.dup_word_frac) == 0.5
    assert r1.top_word == "a"
    assert float(r1.top_word_frac) == 0.5  # 3 chars of 6
    assert r1.top_bigram == "a b"
    assert float(r1.top_bigram_frac) == pytest.approx(4 / 6, abs=1e-6)
    assert not r1.keep  # repetitive: every fraction above threshold
    r2 = rows[2]
    assert r2.n_words == 20 and float(r2.dup_word_frac) == 0.0
    assert r2.keep  # 20 distinct words, uniform: passes every rule


def test_gopher_gate_single_word_doc_has_no_bigram(spark):
    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    r = text.gopher_gate(df).collect()[0]
    assert r.top_bigram is None and float(r.top_bigram_frac) == 0.0
    assert not r.keep  # fails min_words


def test_word_jaccard_topk_hand_example(spark):
    """Query doc {a,b,c}: vs doc 2 {a,b,d} jaccard = 2/4 = 0.5; vs doc 3
    {a,x,y,z} jaccard = 1/6; self excluded."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "a x y z")],
        "doc_id long, text string",
    )
    out = text.word_jaccard_topk(df, df.where(F.col("doc_id") == 1), k=5)
    rows = {r.corpus_id: r for r in out.collect()}
    assert set(rows) == {2, 3}
    assert float(rows[2].jaccard) == 0.5 and rows[2].rnk == 1
    assert float(rows[3].jaccard) == pytest.approx(1 / 6, abs=1e-6)
    assert rows[3].rnk == 2


def test_rrf_fuse_hand_example(spark):
    """Two lists over one query: doc 10 rank 1 in both -> 2/(60+1);
    doc 11 only lexical rank 2 -> 1/62; doc 12 only semantic rank 2 ->
    1/62 with the tie broken by corpus id."""
    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, corpus_id long, rank int"
    )
    sem = spark.createDataFrame(
        [(1, 10, 1), (1, 12, 2)], "query_id long, corpus_id long, rank int"
    )
    out = similarity.rrf_fuse({"lex": lex, "sem": sem}, rrf_k=60, top_k=10)
    rows = sorted(out.collect(), key=lambda r: r.rrf_rank)
    assert [r.corpus_id for r in rows] == [10, 11, 12]
    assert rows[0].n_lists == 2 and rows[1].n_lists == 1
    assert rows[0].rrf_score == pytest.approx(2 * round(1 / 61, 9), abs=1e-12)
    assert rows[1].rrf_score == rows[2].rrf_score  # tie -> id order


def test_char_entropy_hand_example(spark):
    """'aab': H = (2/3)ln(3/2) + (1/3)ln(3) = 0.270310 + 0.366204 nats;
    8 distinct chars: H = 8 * round((1/8)ln 8, 6dp) = 2.079440."""
    df = spark.createDataFrame(
        [(1, "aab"), (2, "abcdefgh")], "doc_id long, text string"
    )
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import char_entropy

    rows = {r.doc_id: r for r in char_entropy(df).collect()}
    assert rows[1].n_chars == 3 and rows[1].n_distinct_chars == 2
    assert rows[1].entropy_nats == pytest.approx(0.636514, abs=1e-9)
    assert not rows[1].keep
    assert rows[2].entropy_nats == pytest.approx(2.079440, abs=1e-9)
    assert rows[2].keep


def test_dsir_weights_self_target_is_zero(spark):
    """target == raw corpus -> every bucket's log ratio is ln(1) = 0, so
    every doc scores exactly 0 regardless of hashing."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")],
        "doc_id long, text string",
    )
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import dsir_weights

    rows = dsir_weights(df, df).collect()
    assert {r.doc_id: r.n_words for r in rows} == {1: 3, 2: 2}
    assert all(r.dsir_logratio == 0.0 for r in rows)


def test_dsir_weights_favors_target_vocabulary(spark):
    """Docs made of target-only words must outscore docs made of
    non-target words (the importance-resampling contract)."""
    rows = [(i, "alpha beta gamma delta") for i in range(5)]
    rows += [(i + 10, "omega psi chi phi") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import dsir_weights

    target = df.where(F.col("doc_id") < 10)
    out = {r.doc_id: r.dsir_logratio for r in dsir_weights(df, target).collect()}
    assert min(out[i] for i in range(5)) > max(out[i + 10] for i in range(5))


def test_bigram_lm_nll_hand_example(spark):
    """Single doc 'a b': one bigram, p = 0.5*(1/1) + 0.5*(1/2) = 0.75,
    mean_nll = -ln(0.75) = 0.287682."""
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import bigram_lm_nll

    r = bigram_lm_nll(df, lam=0.5).collect()[0]
    assert r.n_bigrams == 1
    assert r.mean_nll == pytest.approx(0.287682, abs=1e-9)


def test_phrase_search_hand_example(spark):
    """'a b a b a': phrase 'a b a' matches at anchors 0 and 2 (overlap
    counts); phrase 'b b' never occurs; repeated-term phrases must not
    overcount via double votes."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import phrase_search

    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x a b y")], "doc_id long, text string"
    )
    qs = spark.createDataFrame(
        [(1, "a b a"), (2, "b b"), (3, "a b")], "query_id int, phrase string"
    )
    rows = {(r.query_id, r.id): r for r in phrase_search(docs, qs).collect()}
    assert rows[(1, 1)].n_occurrences == 2  # anchors 0 and 2
    assert rows[(1, 1)].first_pos == 0
    assert (2, 1) not in rows and (2, 2) not in rows
    assert rows[(3, 1)].n_occurrences == 2  # 'a b' at 0 and 2
    assert rows[(3, 2)].n_occurrences == 1 and rows[(3, 2)].first_pos == 1


def test_resample_audio_roundtrip_and_stereo(spark):
    """factor=1 reproduces decode_audio's stats through a re-encode
    round-trip; factor=2 on STEREO keeps whole frames (both channels of
    every even frame), and the re-encoded payload decodes to exactly
    those samples."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.multimodal import (
        _wav_decode,
        _wav_encode,
        decode_audio,
        resample_audio,
    )

    stereo = [10, -10, 20, -20, 30, -30, 40, -40]  # 4 frames x 2 ch
    wav = _wav_encode(stereo, sample_rate=8000, channels=2)
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "media_id long, payload binary"
    )
    r1 = resample_audio(df, factor=1).collect()[0]
    d1 = decode_audio(df).collect()[0]
    assert (r1.n_frames, r1.peak, r1.rms) == (d1.n_frames, d1.peak, d1.rms)

    r2 = resample_audio(df, factor=2).collect()[0]
    assert r2.sample_rate == 4000 and r2.n_frames == 2
    dec = _wav_decode(bytes(r2.payload))
    assert dec is not None
    info, samples = dec
    assert info["channels"] == 2
    assert list(samples) == [10, -10, 30, -30]  # frames 0 and 2

    import pytest as _pytest
    with _pytest.raises(ValueError):
        resample_audio(df, factor=0)


def test_decode_audio_short_payload_is_corrupt_not_foreign(spark):
    """Review r7: payloads too short to be ANY container (empty, 'RIF')
    are corrupt -> decode_ok=False; only real foreign formats (>= 12
    bytes, non-RIFF magic) raise NotImplementedError in the batch."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.multimodal import (
        decode_audio,
        resample_audio,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"")), (2, bytearray(b"RIF")),
         (3, bytearray(b"RIFFxxxx"))],
        "media_id long, payload binary",
    )
    for fn in (decode_audio, resample_audio):
        rows = {r.media_id: r.decode_ok for r in fn(df).collect()}
        assert rows == {1: False, 2: False, 3: False}


def test_ahash_images_flat_vs_gradient(spark):
    """A flat image hashes to all zeros (no pixel exceeds the mean); a
    half-dark/half-bright image sets exactly the bright half's bits; a
    corrupt P6 payload yields decode_ok=False."""
    import numpy as np

    from data_engineering_task_adtech_data_pipeline_spark.operators.multimodal import (
        _ppm_encode,
        ahash_images,
    )

    flat = np.full((12, 16, 3), 100, np.uint8)
    grad = np.zeros((12, 16, 3), np.uint8)
    grad[:, 8:, :] = 200  # right half bright
    df = spark.createDataFrame(
        [(1, bytearray(_ppm_encode(flat))),
         (2, bytearray(_ppm_encode(grad))),
         (3, bytearray(b"P6 garbage"))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in ahash_images(df).collect()}
    assert rows[1].ahash_bits == "0" * 64
    # sampled cols are 2*gx+1 -> gx>=4 samples x>=9 (bright); mean sits
    # between halves, so each row is '0000' + '1111'
    assert rows[2].ahash_bits == ("0000" + "1111") * 8
    assert rows[1].decode_ok and rows[2].decode_ok
    assert not rows[3].decode_ok and rows[3].ahash_bits is None


def test_pseudonymize_consistency_and_nulls(spark):
    """Same value + salt -> same token everywhere; different salt ->
    different token; NULLs stay NULL; distinct cardinality preserved."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import pseudonymize

    df = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, "alice"), (4, None)],
        "id long, name string",
    )
    out = {r.id: r.name for r in pseudonymize(df, ["name"]).collect()}
    assert out[1] == out[3] and out[1] != out[2]
    assert out[1].startswith("pid_") and len(out[1]) == 20
    assert out[4] is None
    out2 = {r.id: r.name for r in
            pseudonymize(df, ["name"], salt="other").collect()}
    assert out2[1] != out[1]


def test_temporal_split_classes_and_null(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.sampling import (
        temporal_split,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-20 00:00:00"),
         (3, "2024-01-24 23:59:59"), (4, "2024-01-25 00:00:00"),
         (5, None)],
        "id long, t string",
    ).select("id", F.col("t").cast("timestamp").alias("ts"))
    out = {r.id: r.split for r in temporal_split(
        df, "ts", "2024-01-20 00:00:00", "5 days"
    ).collect()}
    assert out == {1: "train", 2: "embargo", 3: "embargo",
                   4: "test", 5: None}


def test_y4m_roundtrip_and_decode_contract(spark):
    """Video codec: mono + 444 payloads really encode/decode; corrupt
    payloads yield decode_ok=False (truncated frame, bad magic-length,
    subsampled colorspace); non-Y4M magic raises in the executor batch
    (the shared decode contract)."""
    import numpy as np
    import pytest

    from data_engineering_task_adtech_data_pipeline_spark.operators import multimodal

    rng = np.random.default_rng(42)
    mono = rng.integers(0, 256, (3, 6, 8), dtype=np.uint8)
    full = rng.integers(0, 256, (2, 6, 8, 3), dtype=np.uint8)
    p_mono = multimodal._y4m_encode(mono, fps_num=25, fps_den=1)
    p_444 = multimodal._y4m_encode(full, fps_num=30000, fps_den=1001)
    rows = [
        (1, bytearray(p_mono)),
        (2, bytearray(p_444)),
        (3, bytearray(p_mono[:-4])),                      # truncated frame
        (4, bytearray(b"YUV4MPEG2 W2 H2 F25:1\nFRAME\n\x00\x00\x00\x00")),
        (5, None),                                        # NULL payload
        (6, bytearray(b"\x00" * 5)),                      # too short: corrupt
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in multimodal.decode_video(df).collect()}
    assert got[1].decode_ok and got[1].n_frames == 3
    assert (got[1].width, got[1].height) == (8, 6)
    assert got[1].duration_ms == 3 * 1000 // 25
    assert got[1].lum_peak == int(mono.max())
    assert got[1].lum_sum == int(mono.astype("int64").sum())
    assert got[2].decode_ok and got[2].n_frames == 2
    # 444 stats come from the Y plane only
    assert got[2].lum_sum == int(full[..., 0].astype("int64").sum())
    assert got[2].duration_ms == 2 * 1000 * 1001 // 30000
    for bad in (3, 4, 5, 6):  # 4: C420 default needs 6 bytes, has 4
        assert not got[bad].decode_ok, bad
    # foreign container magic raises inside the executor batch
    avi = spark.createDataFrame(
        [(9, bytearray(b"RIFF\x00\x00\x00\x00AVI LIST"))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|Y4M|yuv4mpeg|YUV4MPEG2"):
        multimodal.decode_video(avi).collect()


def test_y4m_c420_roundtrip_upsample_and_rejects():
    """C420 codec (round 9): encode (Y, U, V) planes with VARYING chroma,
    decode, and check (a) the Y plane survives bit-for-bit (the stats
    path), (b) every full-res chroma value equals its half-res block
    source — the exact nearest-neighbor upsample contract pixel (x, y)
    <- block (x//2, y//2); (c) the 420 tag family all parse; (d) odd
    dims and 16-bit planes stay rejected."""
    import numpy as np

    from data_engineering_task_adtech_data_pipeline_spark.operators import multimodal

    rng = np.random.default_rng(7)
    n, h, w = 2, 6, 8
    yp = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    up = rng.integers(0, 256, (n, h // 2, w // 2), dtype=np.uint8)
    vp = rng.integers(0, 256, (n, h // 2, w // 2), dtype=np.uint8)
    p = multimodal._y4m_encode((yp, up, vp), fps_num=25, fps_den=1)
    info, frames = multimodal._y4m_decode(p)
    assert info["colorspace"] == "420" and info["n_frames"] == n
    assert frames.shape == (n, h, w, 3)
    assert (frames[..., 0] == yp).all()
    for y in range(h):
        for x in range(w):
            assert (frames[:, y, x, 1] == up[:, y // 2, x // 2]).all()
            assert (frames[:, y, x, 2] == vp[:, y // 2, x // 2]).all()
    # tag family: same plane layout under every 420 siting variant
    for tag in (b"420jpeg", b"420mpeg2", b"420paldv"):
        alias = p.replace(b" C420\n", b" C" + tag + b"\n", 1)
        info2, frames2 = multimodal._y4m_decode(alias)
        assert (frames2 == frames).all() and info2["colorspace"] == tag.decode()
    # odd dims: plane split ill-defined -> corrupt, not a crash
    assert multimodal._y4m_decode(
        b"YUV4MPEG2 W3 H2 F25:1 C420\nFRAME\n" + b"\x00" * 9
    ) is None
    # 16-bit planes remain an unsupported sub-format
    assert multimodal._y4m_decode(
        b"YUV4MPEG2 W2 H2 F25:1 C420p10\nFRAME\n" + b"\x00" * 12
    ) is None
    import pytest

    with pytest.raises(ValueError, match="even"):
        multimodal._y4m_encode(
            (yp[:, :5, :], up, vp)
        )


def test_y4m_c422_roundtrip_upsample_and_rejects():
    """C422 codec (round 10, r9 VERDICT #6): encode (Y, U, V) with
    half-WIDTH full-height chroma, decode, and check (a) the Y plane
    survives bit-for-bit, (b) every full-res chroma value equals its
    block source — the horizontal-only nearest-neighbor contract pixel
    (x, y) <- block (x//2, y): no vertical mixing, which is what
    distinguishes 4:2:2 from 4:2:0, (c) ODD HEIGHT is legal (only the
    width is subsampled), (d) odd width stays rejected on both encode
    and decode."""
    import numpy as np
    import pytest

    from data_engineering_task_adtech_data_pipeline_spark.operators import multimodal

    rng = np.random.default_rng(11)
    n, h, w = 2, 5, 8  # odd height on purpose — legal for 422
    yp = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    up = rng.integers(0, 256, (n, h, w // 2), dtype=np.uint8)
    vp = rng.integers(0, 256, (n, h, w // 2), dtype=np.uint8)
    p = multimodal._y4m_encode((yp, up, vp), fps_num=25, fps_den=1)
    info, frames = multimodal._y4m_decode(p)
    assert info["colorspace"] == "422" and info["n_frames"] == n
    assert frames.shape == (n, h, w, 3)
    assert (frames[..., 0] == yp).all()
    for y in range(h):
        for x in range(w):
            assert (frames[:, y, x, 1] == up[:, y, x // 2]).all()
            assert (frames[:, y, x, 2] == vp[:, y, x // 2]).all()
    # odd width: rejected by decode (corrupt, not a crash) and encode
    assert multimodal._y4m_decode(
        b"YUV4MPEG2 W3 H2 F25:1 C422\nFRAME\n" + b"\x00" * 10
    ) is None
    with pytest.raises(ValueError, match="even width"):
        multimodal._y4m_encode((yp[:, :, :7], up[:, :, :3], vp[:, :, :3]))
    # a chroma shape that matches no supported layout is rejected loudly
    with pytest.raises(ValueError, match="chroma planes"):
        multimodal._y4m_encode(
            (yp[:, :4, :], up[:, :3, :], vp[:, :3, :])
        )


def test_y4m_c411_roundtrip_upsample_and_rejects():
    """C411 codec (round 10, completing the horizontal-subsample family):
    quarter-width full-height chroma, exact nearest-neighbor contract
    pixel (x, y) <- block (x//4, y); odd height legal; width not
    divisible by 4 rejected on both encode and decode."""
    import numpy as np
    import pytest

    from data_engineering_task_adtech_data_pipeline_spark.operators import multimodal

    rng = np.random.default_rng(13)
    n, h, w = 2, 3, 8  # odd height on purpose — legal for 411
    yp = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    up = rng.integers(0, 256, (n, h, w // 4), dtype=np.uint8)
    vp = rng.integers(0, 256, (n, h, w // 4), dtype=np.uint8)
    p = multimodal._y4m_encode((yp, up, vp), fps_num=25, fps_den=1)
    info, frames = multimodal._y4m_decode(p)
    assert info["colorspace"] == "411" and info["n_frames"] == n
    assert frames.shape == (n, h, w, 3)
    assert (frames[..., 0] == yp).all()
    for y in range(h):
        for x in range(w):
            assert (frames[:, y, x, 1] == up[:, y, x // 4]).all()
            assert (frames[:, y, x, 2] == vp[:, y, x // 4]).all()
    # width not divisible by 4: decode -> corrupt; encode -> loud error
    assert multimodal._y4m_decode(
        b"YUV4MPEG2 W6 H2 F25:1 C411\nFRAME\n" + b"\x00" * 18
    ) is None
    with pytest.raises(ValueError, match="divisible by 4"):
        multimodal._y4m_encode(
            (
                rng.integers(0, 256, (1, 2, 12), dtype=np.uint8)[:, :, :6],
                rng.integers(0, 256, (1, 2, 1), dtype=np.uint8),
                rng.integers(0, 256, (1, 2, 1), dtype=np.uint8),
            )
        )


def test_sample_frames_decimation_and_ahash_compose(spark):
    """sample_frames keeps frames 0, k, 2k... and re-encodes REAL P6
    payloads that the existing image path decodes back to the exact Y
    plane; identical frames across videos then bucket by aHash."""
    import numpy as np
    import pytest

    from data_engineering_task_adtech_data_pipeline_spark.operators import multimodal

    with pytest.raises(ValueError, match="every_n"):
        multimodal.sample_frames(
            spark.createDataFrame([], "media_id long, payload binary"),
            every_n=0,
        )

    rng = np.random.default_rng(7)
    clip = rng.integers(0, 256, (5, 6, 8), dtype=np.uint8)
    p = multimodal._y4m_encode(clip)
    df = spark.createDataFrame(
        [(1, bytearray(p)), (2, bytearray(p)), (3, bytearray(p[:-3]))],
        "media_id long, payload binary",
    )
    frames = multimodal.sample_frames(df, every_n=2)
    got = sorted((r.media_id, r.frame_idx) for r in frames.collect())
    # 5 frames, every 2nd -> idx 0, 2, 4; corrupt payload 3 emits nothing
    assert got == [(1, 0), (1, 2), (1, 4), (2, 0), (2, 2), (2, 4)]

    # the re-encoded P6 payload round-trips to the exact Y plane
    row = frames.where(
        (F.col("media_id") == 1) & (F.col("frame_idx") == 4)
    ).collect()[0]
    arr = multimodal._ppm_decode(bytes(row.payload))
    assert (arr[:, :, 0] == clip[4]).all() and (arr[:, :, 2] == clip[4]).all()

    # compose with ahash_images: identical frames across videos 1 and 2
    # share every fingerprint
    fid = (F.col("media_id") * 16 + F.col("frame_idx")).alias("media_id")
    h = multimodal.ahash_images(frames.select(fid, "payload"))
    by_frame = {}
    for r in h.collect():
        assert r.decode_ok
        by_frame.setdefault(r.media_id % 16, set()).add(r.ahash_bits)
    assert set(by_frame) == {0, 2, 4}
    assert all(len(v) == 1 for v in by_frame.values())


def test_bpe_batched_equals_strict_at_64_merges(spark):
    """r7 VERDICT #5: the batched path (with its localCheckpoint
    re-rooting every 16 fold layers) must stay EXACTLY strict-greedy at a
    merge count deep enough to cross several checkpoint boundaries —
    64 merges over the smoke corpus, compared rank-for-rank."""
    from conftest import SF_SMOKE

    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        bpe_learn_merges,
    )
    from data_engineering_task_adtech_data_pipeline_spark.sources.readers import (
        Testdata,
    )

    corpus = Testdata(spark, SF_SMOKE).documents.select("text")
    strict = [tuple(r) for r in
              bpe_learn_merges(corpus, n_merges=64).collect()]
    batched = [tuple(r) for r in
               bpe_learn_merges(corpus, n_merges=64, batch=True).collect()]
    assert len(strict) == 64
    assert batched == strict


def test_kmv_sketch_estimate_and_determinism(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators import sketch

    # overlapping groups of known cardinality: big ⊃ mid ⊃ small
    big = spark.range(10_000).select(
        F.lit("big").alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    mid = spark.range(1_000).select(
        F.lit("mid").alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    small = spark.range(40).select(
        F.lit("small").alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    df = big.unionByName(mid).unionByName(small)
    k = 256
    sk = sketch.kmv_sketch(df, "v", ["g"], k=k)
    est = {r.g: r.est_distinct for r in
           sketch.kmv_estimate(sk, ["g"], k=k).collect()}
    # KMV standard error ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert abs(est["big"] - 10_000) / 10_000 < 0.25, est
    assert abs(est["mid"] - 1_000) / 1_000 < 0.25, est
    # exact regime: fewer distinct values than k
    assert est["small"] == 40.0, est
    # pure function of the value set (partitioning-invariant)
    sk2 = sketch.kmv_sketch(df.repartition(37), "v", ["g"], k=k)
    assert sorted(map(tuple, sk.collect())) == sorted(
        map(tuple, sk2.collect())
    )


def test_kmv_merge_law(spark):
    """kmv_merge(sketch(A), sketch(B)) == kmv_sketch(A ∪ B) exactly —
    the mergeability invariant that makes partial per-partition/per-day
    sketches combine without touching raw data."""
    from data_engineering_task_adtech_data_pipeline_spark.operators import sketch

    a = spark.range(5_000).select(
        F.lit("g").alias("g"), F.concat(F.lit("x"), F.col("id")).alias("v")
    )
    # overlaps a on [2500, 5000), extends to 7500
    b = spark.range(2_500, 7_500).select(
        F.lit("g").alias("g"), F.concat(F.lit("x"), F.col("id")).alias("v")
    )
    k = 128
    merged = sketch.kmv_merge(
        sketch.kmv_sketch(a, "v", ["g"], k=k),
        sketch.kmv_sketch(b, "v", ["g"], k=k),
        ["g"], k=k,
    )
    direct = sketch.kmv_sketch(a.unionByName(b), "v", ["g"], k=k)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_kmv_intersect_pairs_exact_and_estimated(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators import sketch

    # exact regime: distinct counts below k -> estimates are exact set sizes
    rows = [("a", v) for v in range(30)] + [("b", v) for v in range(20, 50)]
    df = spark.createDataFrame(rows, "g string, v int")
    sk = sketch.kmv_sketch(df, "v", ["g"], k=64)
    out = sketch.kmv_intersect_pairs(sk, "g", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.group_a, r.group_b) == ("a", "b")
    assert r.n_common == 10 and r.est_inter == 10.0
    assert r.est_union == 50.0 and r.jaccard_est == 0.2
    # estimation regime: 4k distinct per side, 2k shared, k=256
    a = spark.range(4_000).select(
        F.lit("a").alias("g"), F.concat(F.lit("u"), F.col("id")).alias("v")
    )
    b = spark.range(2_000, 6_000).select(
        F.lit("b").alias("g"), F.concat(F.lit("u"), F.col("id")).alias("v")
    )
    sk2 = sketch.kmv_sketch(a.unionByName(b), "v", ["g"], k=256)
    r2 = sketch.kmv_intersect_pairs(sk2, "g", k=256).collect()[0]
    assert abs(r2.est_inter - 2_000) / 2_000 < 0.4, r2
    assert abs(r2.est_union - 6_000) / 6_000 < 0.25, r2


def test_audio_fingerprint_short_clip_and_contract(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators import (
        multimodal,
    )

    # 5-char text -> 5 frames < 16 windows: trailing windows are empty
    # and must emit '0' bits (the oracle's COALESCE(e, 0) twin)
    docs = spark.createDataFrame(
        [(1, "abcde"), (2, "abcde"), (3, None)],
        "doc_id long, text string",
    )
    fp = multimodal.audio_fingerprint(multimodal.synth_wav(docs)).collect()
    by_id = {r.media_id: r for r in fp}
    assert by_id[1].decode_ok and by_id[1].n_frames == 5
    assert len(by_id[1].fp_bits) == 16
    # frame i lands in window (i*16)//5: only {0,3,6,9,12} can be
    # non-empty; every other window is empty and must emit '0'
    occupied = {(i * 16) // 5 for i in range(5)}
    for w in range(16):
        if w not in occupied:
            assert by_id[1].fp_bits[w] == "0", (w, by_id[1].fp_bits)
    # identical clips -> identical fingerprints (the dup-group property)
    assert by_id[1].fp_bits == by_id[2].fp_bits
    assert not by_id[3].decode_ok
    # corrupt payload: decode_ok=False, never a raise
    bad = spark.createDataFrame(
        [(9, bytearray(b"RIFFxxxx"))], "media_id long, payload binary"
    )
    r = multimodal.audio_fingerprint(bad).collect()[0]
    assert not r.decode_ok


# ---------------------------------------------------------------------------
# int8 scalar quantization (round 9)
# ---------------------------------------------------------------------------


def test_sq8_encode_hand_example(spark):
    """Known vectors -> known scales and codes: dims with absmax 2.0 /
    0.5 / 0.0; half-up rounding at the exact boundary (1.5/2.0*127+0.5
    = 95.75 -> 95; 0.25/0.5*127 = 63.5 -> floor(64.0) = 64); a
    constant-zero dimension encodes 0 (no div-by-zero); the corpus
    absmax itself encodes +/-127."""
    from data_engineering_task_adtech_data_pipeline_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [2.0, 0.25, 0.0]), (2, [-1.5, -0.5, 0.0])],
        "vec_id long, embedding array<double>",
    )
    scales = similarity.sq8_scales(df)
    assert scales == [2.0, 0.5, 0.0]
    got = {
        r.vec_id: r.code
        for r in df.select(
            "vec_id",
            similarity.sq8_encode_expr(F.col("embedding"), scales).alias(
                "code"
            ),
        ).collect()
    }
    assert got[1] == [127, 64, 0]
    # -1.5/2*127+0.5 = -94.75 -> floor = -95; -0.5/0.5 -> -127+0.5 -> -127
    assert got[2] == [-95, -127, 0]


def test_sq8_topk_recall_floor_and_shortlist_contract(spark):
    """sq8 top-k vs exact cosine on the real embeddings table: recall@5
    must clear 0.9 with a shortlist of 4k (int8 over 64 dims is a fine
    quantizer); rank/tie determinism matches the exact path's contract;
    int8_dot is bounded by 127^2 * dim."""
    from conftest import SF_ORACLE

    from data_engineering_task_adtech_data_pipeline_spark.operators import similarity
    from data_engineering_task_adtech_data_pipeline_spark.sources.readers import (
        Testdata,
    )

    emb = Testdata(spark, SF_ORACLE).embeddings
    q = emb.where(F.col("vec_id") < 10)
    sq = similarity.sq8_topk(emb, q, k=5).collect()
    exact = similarity.brute_force_topk(emb, q, k=5).collect()
    assert len(sq) == 50 and len(exact) == 50
    er = {(r.query_id, r.corpus_id) for r in exact}
    sr = {(r.query_id, r.corpus_id) for r in sq}
    assert len(er & sr) / len(er) >= 0.9
    assert all(abs(r.int8_dot) <= 127 * 127 * 64 for r in sq)
    # per-query ranks are 1..5 with no gaps
    by_q = {}
    for r in sq:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())


def test_aqe_off_switch_is_reentrancy_safe(spark):
    """r9 ADVICE: overlapping bpe_learn_merges(batch=True) calls on one
    session could restore the wrong prior AQE value (the inner call's
    'prev' is the outer call's 'false'). The depth counter makes only
    the outermost enter snapshot and only the matching exit restore."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        _AQE_KEY,
        _aqe_off_enter,
        _aqe_off_exit,
    )

    from data_engineering_task_adtech_data_pipeline_spark.operators import text as text_mod

    prev = spark.conf.get(_AQE_KEY, "true")
    try:
        _aqe_off_enter(spark)
        assert spark.conf.get(_AQE_KEY) == "false"
        _aqe_off_enter(spark)  # overlapping second call
        _aqe_off_exit(spark)  # inner exit must NOT restore yet
        assert spark.conf.get(_AQE_KEY) == "false"
        _aqe_off_exit(spark)
        assert spark.conf.get(_AQE_KEY) == prev
    finally:
        # a mid-test assertion failure must not leave the SHARED session
        # fixture with AQE off + a stale depth entry (round-10 review)
        text_mod._aqe_state.pop(id(spark), None)
        spark.conf.set(_AQE_KEY, prev)


def test_bpe_batched_equals_strict_random_corpora(spark):
    """Round-9 regression pin for the batcher's full_table fast path and
    visibility floor: seeded-random corpora over a 3-letter alphabet
    (maximal tie/interaction density — nearly every top pair shares a
    symbol, and small counts tie constantly) must reproduce the strict
    learner rank-for-rank. These corpora are small enough that every
    round sees the WHOLE pair table, so the no-conflict-anywhere
    independence argument (c_bound=None) is exactly the path exercised."""
    import random

    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        bpe_learn_merges,
    )

    for seed in range(8):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 30))
        ]
        corpus = spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)], "id long, text string"
        )
        n = rng.randint(2, 9)
        strict = [tuple(r) for r in
                  bpe_learn_merges(corpus, n_merges=n).collect()]
        batched = [tuple(r) for r in
                   bpe_learn_merges(corpus, n_merges=n, batch=True).collect()]
        assert batched == strict, (seed, n, words, strict, batched)


def test_bm25_shared_tf_identical(spark):
    """Round-15 pin for the shared inverted-index input (VERDICT #4): a
    caller-materialized term_freq frame passed via ``tf=`` must produce
    exactly the rows the internal path builds — same aggregation, so the
    whole scored output is row-identical."""
    from pyspark.sql import functions as F

    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        bm25_scores,
        term_freq,
    )

    docs = spark.createDataFrame(
        [
            (1, "slow join slow shuffle"),
            (2, "fast join"),
            (3, "window window window batch"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "slow"), (1, "join"), (2, "window")], "query_id int, term string"
    )
    internal = {tuple(r) for r in bm25_scores(docs, q, k=None).collect()}
    shared_tf = term_freq(docs).localCheckpoint()
    shared = {
        tuple(r) for r in bm25_scores(docs, q, k=None, tf=shared_tf).collect()
    }
    assert shared == internal
    # the tf frame doubles as the relevance-count table (q80's tfc reuse)
    tfc = {
        tuple(r)
        for r in shared_tf.where(F.col("tf") >= 2)
        .select("id", "term")
        .collect()
    }
    assert tfc == {(1, "slow"), (3, "window")}


def test_materialize_gate_and_release(spark):
    """Round-15 pin for chunking.materialize: below the size threshold
    the frame is returned UNCHANGED (no persist — bench-scale recompute
    is the measured-faster form), while min_bytes=0 forces an eager
    persist that release_persisted() then unpersists."""
    from data_engineering_task_adtech_data_pipeline_spark.operators import (
        chunking,
    )

    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    lazy = chunking.materialize(df, min_bytes=1 << 40)
    assert lazy is df
    assert chunking.plan_size_estimate(df) > 0

    eager = chunking.materialize(df, min_bytes=0)
    assert eager.storageLevel.useMemory  # persisted (and already counted)
    assert chunking.release_persisted() >= 1
    assert not eager.storageLevel.useMemory


def test_fan_out_pairs_survives_same_key_dedup(spark):
    """Round-15 regression pin: fan_out_pairs placed AFTER a
    distinct()/dropDuplicates on (id_a, id_b) must still pin the
    partition count — the round-14 same-column form was statically
    satisfied by the dedup's own exchange, so Catalyst removed it and
    AQE coalesced the verify stage back to 1-3 tasks (the q49
    straggler)."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.dedup import (
        fan_out_pairs,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long"
    )
    fanned = fan_out_pairs(pairs.distinct())
    n = spark.sparkContext.defaultParallelism
    assert fanned.rdd.getNumPartitions() == n
