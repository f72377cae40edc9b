"""Pins for quality_classifier_train (rows-only by contract): the
distributed GD trainer must actually learn — loss decreases, accuracy
clears a floor, and the learned model attributes its decision to the
stop-token bucket (the signal the weak labels were derived from).
"""

from __future__ import annotations

import numpy as np
import pytest

from etl_covid19_brasil_spark.llm.classifier import _bucket, logreg_train_quality
from etl_covid19_brasil_spark.registry import T
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def trained(spark):
    mdf, w = logreg_train_quality(T(spark, SF_SMOKE, "documents"))
    return mdf.collect(), w


def test_loss_decreases(trained):
    rows, _ = trained
    losses = [r["loss_u6"] for r in sorted(rows, key=lambda r: r["iter"])]
    assert len(losses) == 30
    # monotone non-increasing within quantization, and a real drop overall
    assert all(b <= a + 1 for a, b in zip(losses, losses[1:]))
    assert losses[-1] < losses[0] * 0.8


def test_accuracy_floor(trained):
    rows, _ = trained
    final = max(rows, key=lambda r: r["iter"])
    assert final["accuracy_ppm"] >= 900_000, final


def test_model_attributes_to_stop_bucket(trained):
    _, w = trained
    sb = _bucket("a", 256)
    feature_w = w[:-1]
    assert feature_w[sb] > 0
    assert np.argmax(np.abs(feature_w)) == sb


def test_kmeans_elbow_monotone(spark):
    """Inertia must strictly decrease as k grows (more cells can only
    tighten the quantization on this corpus), and every k covers the
    full corpus — the invariant pair that keeps the elbow curve honest."""
    from etl_covid19_brasil_spark.registry import all_specs

    rows = sorted(
        all_specs()["embedding_kmeans_elbow"].spark(spark, SF_SMOKE).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [2, 4, 8]
    assert rows[0]["inertia_u3"] > rows[1]["inertia_u3"] > rows[2]["inertia_u3"]
    assert len({r["n_vectors"] for r in rows}) == 1 and rows[0]["n_vectors"] > 0
