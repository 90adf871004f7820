"""Physical-plan audits for the spark-submit JOBS (VERDICT r4 #6).

tests/test_plans.py guards the 49 registered queries; the scaling
evidence, however, leans on jobs/build_tiers.py, jobs/dedup_pipeline.py
and jobs/ann_pipeline.py. This file audits the exact DAG compositions
those jobs build (same library calls, same parameters — file:line
references at each block) for the properties that make them viable at
100 TB:

* no row-wise BatchEvalPython anywhere; Python only as Arrow stages
  (MapInPandas / ArrowEvalPython), and only in the stages that declare
  them;
* no CartesianProduct / BroadcastNestedLoopJoin in any banded or
  bucketed candidate join (the quadratic catastrophe a plan regression
  would smuggle in) — the one declared exception is knn_bruteforce's
  non-equi broadcast join, which IS the exact O(Q·N) baseline;
* the IVF cell assignment stays a zero-Exchange scan→project;
* the LSH candidate join broadcasts its probe side.
"""

from __future__ import annotations

import re

import pytest

from fforma_spark.sources.synth import (
    synth_documents,
    synth_embeddings,
    synth_sequences,
)

N_DOCS = 60


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _assert_no_rowwise_python(plan: str, ctx: str) -> None:
    assert "BatchEvalPython" not in plan, f"row-wise Python UDF in {ctx}"


def _assert_no_quadratic_join(plan: str, ctx: str) -> None:
    assert "CartesianProduct" not in plan, f"cartesian product in {ctx}"
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"nested-loop join in {ctx}"
    )


# The audited jobs read STORED parquet (--input mode, the bench
# protocol's "identical stored bytes"); the synth generator is itself
# a MapInPandas stage, so the fixtures store-then-read to audit the
# jobs' actual input DAG, not the generator's.


@pytest.fixture(scope="module")
def docs(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("jobplans") / "docs")
    synth_documents(spark, N_DOCS, 7).write.parquet(p)
    return spark.read.parquet(p)


@pytest.fixture(scope="module")
def seq(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("jobplans") / "seq")
    synth_sequences(spark, N_DOCS, 7).write.parquet(p)
    return spark.read.parquet(p)


@pytest.fixture(scope="module")
def emb(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("jobplans") / "emb")
    synth_embeddings(spark, 200, 7).write.parquet(p)
    return spark.read.parquet(p)


# --- jobs/build_tiers.py ----------------------------------------------------


def test_tiers_job_ladder_plan(spark, seq):
    """The ladder input DAG (explode_panel → rollup_tier; job
    composition at jobs/build_tiers.py:124-127 via
    plans/checkpoint.materialize_ladder): pure Catalyst, ONE exchange
    for the tier agg, two-phase aggregation."""
    from fforma_spark.operators.reshape import explode_panel
    from fforma_spark.operators.rollup import rollup_tier

    t1 = rollup_tier(explode_panel(seq), 60)
    plan = _plan(t1)
    _assert_no_rowwise_python(plan, "tiers ladder")
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1


def test_tiers_job_compress_plan(spark, seq):
    """compressed_blocks (jobs/build_tiers.py:137): the codec is ONE
    vectorized ArrowEvalPython stage, nothing row-wise."""
    from fforma_spark.functions.compress import compressed_blocks

    plan = _plan(compressed_blocks(seq))
    _assert_no_rowwise_python(plan, "compress tier")
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_tiers_job_features_plan_whale_capped(spark, seq):
    """features_wide with the whale cap armed (jobs/build_tiers.py:155,
    --max-series-len default 65536): the kernel fabric is MapInPandas;
    the whale-cap JVM-side exact moments add no Python stage and no
    extra shuffle of the token arrays."""
    from fforma_spark.functions.features import features_wide

    plan = _plan(features_wide(seq, max_series_len=65536))
    _assert_no_rowwise_python(plan, "feature tier")
    assert "MapInPandas" in plan


# --- jobs/dedup_pipeline.py -------------------------------------------------


def test_dedup_job_plans(spark, docs):
    """Every dedup op the job times (jobs/dedup_pipeline.py:104-148,
    same parameters): Catalyst-only — no Python stage AT ALL — and no
    quadratic join anywhere (the banded/bucketed joins are all
    hash-equi joins on band keys)."""
    from fforma_spark.pipeline import dedup as D

    dags = {
        "exact": D.exact_dedup(docs),
        "minhash_r1": D.minhash_neardup(docs, 0.5),
        "minhash_r2": D.minhash_neardup(docs, 0.5, r=2),
        "sh64_candidates": D.sh64_band_candidates(D.simhash64(docs)),
        "sh64_hamming3": D.simhash_hamming_neardup(docs, max_dist=3),
        "ngram_jaccard": D.ngram_jaccard_neardup(docs, 0.5, max_df=100),
    }
    for name, df in dags.items():
        plan = _plan(df)
        _assert_no_rowwise_python(plan, name)
        _assert_no_quadratic_join(plan, name)
        assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan, (
            f"unexpected Python stage in {name}"
        )


# --- jobs/ann_pipeline.py ---------------------------------------------------


def test_ann_job_lsh_plan(spark, emb):
    """ann_lsh_topk as the job runs it (jobs/ann_pipeline.py:100,
    production defaults): the ONLY Python stages are the declared
    Arrow signature kernels (one per side of the probe/candidate
    split), the candidate join broadcasts, and nothing is quadratic."""
    from fforma_spark.pipeline import similarity as S

    pairs_plan = _plan(S.ann_lsh_candidate_pairs(emb, 8))
    _assert_no_rowwise_python(pairs_plan, "lsh candidates")
    _assert_no_quadratic_join(pairs_plan, "lsh candidates")
    assert "BroadcastHashJoin" in pairs_plan  # probes broadcast
    # exactly one signature kernel per branch (probe, candidate) — a
    # two-step select regresses to 2 per branch via CollapseProject
    # duplication, silently doubling the 1M-row hash pass
    arrow = len(re.findall(r"^\(\d+\) ArrowEvalPython", pairs_plan, re.M))
    assert 1 <= arrow <= 2, f"duplicated signature kernel: {arrow} stages"

    topk_plan = _plan(S.ann_lsh_topk(emb, 8, 10))
    _assert_no_rowwise_python(topk_plan, "lsh topk")
    _assert_no_quadratic_join(topk_plan, "lsh topk")


def test_ann_job_lsh_big_q_drops_pairs_broadcast(spark, emb):
    """At production Q the candidate-pair table is millions of id
    rows; the broadcast() hint on it is binding (AQE cannot demote an
    explicit hint) and its single-threaded driver-side hash-relation
    build measured as a hard 2.0× plateau on the 8→32 lsh1m_q512 leg.
    ann_lsh_topk must drop the hint once the expected pair count
    passes BROADCAST_PAIRS_MAX, leaving a shuffle join on vec_id."""
    from fforma_spark.pipeline import similarity as S

    # Q=512 at the N the bench runs (1M): est 512·4·137·1M/2^16 ≈ 4.3M
    # pairs — far past the 1M-row cap
    est = S._expected_lsh_pairs(512, S.N_TABLES, S.N_BITS,
                                S.PROBE_HAMMING, 1_000_000)
    assert est > S.BROADCAST_PAIRS_MAX
    # the 200-row fixture sits under autoBroadcastJoinThreshold, so
    # Catalyst would STATISTICALLY broadcast the un-hinted join and
    # mask the hint's presence; disable the threshold so the only
    # broadcasts left are the explicit hints — exactly the situation
    # at 1M rows, where stats put every side far past the threshold
    thresh = emb.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
    emb.sparkSession.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # the pairs⋈embeddings join must be a shuffle join: with the
        # hint gone Catalyst plans SMJ/SHJ on vec_id (the tiny q side
        # keeps its broadcast — assert the shuffle join exists, not
        # that broadcasts vanish)
        plan = _plan(S.ann_lsh_topk(emb, 512, 10, n_vecs=1_000_000))
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        # the small-Q default (the oracled driver row's shape) still
        # broadcasts end to end: no shuffle join in its plan
        small = _plan(S.ann_lsh_topk(emb, 8, 10, n_vecs=1_000_000))
        assert ("SortMergeJoin" not in small
                and "ShuffledHashJoin" not in small), small
    finally:
        emb.sparkSession.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", thresh)


def test_ann_job_ivf_assignment_zero_shuffle(spark, emb):
    """The IVF cell assignment (jobs/ann_pipeline.py:101-113 via
    ann_ivf_topk → _assign_cells): literal-centroid scan→project with
    ZERO Exchange — the scaling evidence's core claim for this op."""
    from pyspark.sql import functions as F

    from fforma_spark.pipeline import similarity as S

    e = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding"
    )
    cents = S._seed_centroids(e, 8, 8)
    assign = S._assign_cells(e, cents)
    plan = _plan(assign)
    assert "Exchange" not in plan, "IVF assignment must not shuffle"
    _assert_no_rowwise_python(plan, "ivf assignment")


def test_ann_job_knn_is_the_declared_exception(spark, emb):
    """knn_bruteforce (jobs/ann_pipeline.py:99) is the exact O(Q·N)
    baseline: its non-equi join MAY be a broadcast nested-loop — but
    the broadcast must be the tiny query side, and no Python stage."""
    from fforma_spark.pipeline import similarity as S

    plan = _plan(S.knn_bruteforce(emb, 8, 10))
    _assert_no_rowwise_python(plan, "knn")
    assert "CartesianProduct" not in plan


def test_ann_job_neardup_lsh_plan(spark, emb):
    """embedding_neardup_lsh as the neardup leg runs it
    (jobs/ann_pipeline.py --ops neardup, data-derived defaults 12×24
    Hamming≤1): the only Python stages are the Arrow signature kernels
    (one per side of the probe/index split), the bucket self-join is a
    hash equi-join (never quadratic), and the verify joins back by id."""
    from fforma_spark.pipeline import similarity as S

    plan = _plan(S.embedding_neardup_lsh(emb, 0.9, 12, 24, 1))
    _assert_no_rowwise_python(plan, "neardup lsh")
    _assert_no_quadratic_join(plan, "neardup lsh")
    arrow = len(re.findall(r"^\(\d+\) ArrowEvalPython", plan, re.M))
    assert 1 <= arrow <= 2, f"duplicated signature kernel: {arrow} stages"
