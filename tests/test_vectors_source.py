"""Deterministic synthetic embeddings (sources/vectors.py) — the ANN
scale-rehearsal corpus generator."""

import numpy as np
import pytest

from json_remedy_spark.sources.vectors import _centers, synthesize_vectors


def test_partition_invariance(spark):
    """Same vec_id -> same vector at any parallelism (the property
    that makes the 200k/2M rehearsal corpora comparable)."""
    a = {r["vec_id"]: r["embedding"] for r in synthesize_vectors(spark, 64, partitions=1).collect()}
    b = {r["vec_id"]: r["embedding"] for r in synthesize_vectors(spark, 64, partitions=7).collect()}
    assert a == b and len(a) == 64


def test_schema_and_norms(spark):
    df = synthesize_vectors(spark, 200, dims=32, n_labels=4)
    assert [f.simpleString() for f in df.schema.fields] == [
        "vec_id:bigint", "embedding:array<float>", "label:int",
    ]
    rows = df.collect()
    labs = {r["label"] for r in rows}
    assert labs <= set(range(4)) and len(labs) == 4
    norms = [float(np.linalg.norm(r["embedding"])) for r in rows[:20]]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)


def test_cluster_structure(spark):
    """Vectors sit nearer their own center than any other — IVF/LSH
    probing over this corpus is a real (not degenerate) workload."""
    rows = synthesize_vectors(spark, 500, dims=64, n_labels=8, seed=7).collect()
    centers = _centers(8, 64, 7)
    own, best_other = [], []
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        cos = centers @ v
        own.append(cos[r["label"]])
        best_other.append(np.delete(cos, r["label"]).max())
    assert np.mean(own) > 0.75
    # separable on average, with a margin over the runner-up center
    assert np.mean(own) - np.mean(best_other) > 0.3
    # but not trivially collapsed onto the centers
    assert np.std(own) > 0.01


def test_seed_changes_corpus(spark):
    a = synthesize_vectors(spark, 32, seed=1).collect()
    b = synthesize_vectors(spark, 32, seed=2).collect()
    assert {r["vec_id"] for r in a} == {r["vec_id"] for r in b}
    diff = sum(
        1
        for ra, rb in zip(sorted(a, key=lambda r: r["vec_id"]), sorted(b, key=lambda r: r["vec_id"]))
        if ra["embedding"] != rb["embedding"]
    )
    assert diff == 32


def test_odd_dims_rejected(spark):
    with pytest.raises(ValueError):
        synthesize_vectors(spark, 8, dims=63)
