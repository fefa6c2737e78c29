"""SURVEY §7.3 end-to-end slice: every engine layer in one pipeline."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import end_to_end


def test_end_to_end_slice(spark, tmp_path):
    out = end_to_end.run(spark, "/root/testdata/sf0.001", str(tmp_path))
    assert out["missing"]["c_acctbal"] > 0          # holes were created
    assert len(out["segments"]) == 5                # 5 market segments
    assert out["version"] == 0
    assert list(out["changes"]) == ["imputed mean c_acctbal", "label-encoded segment"]
    assert 0.0 <= out["metrics"]["accuracy"] <= 1.0
    assert set(out["metrics"]) >= {"accuracy", "precision", "recall", "f1"}
    # artifacts landed
    from ml_data_pipeline_spark.ml.pipeline import load_model, load_params_json

    m = load_model(spark, str(tmp_path / "models" / "segment_lr"))
    assert m is not None
    p = load_params_json(str(tmp_path / "segment_lr_params.json"))
    assert p["task_type"] == "classification"


def test_corpus_prep_pipeline(spark):
    """examples/corpus_prep.py: the §2.9 LLM-corpus pipeline end to end —
    dedup shrinks, quality gates shrink further, packing bins exist."""
    import corpus_prep

    out = corpus_prep.run(spark, "/root/testdata/sf0.001")
    assert out["after_exact_dedup"] <= out["input_docs"]
    assert out["after_near_dedup"] < out["input_docs"]  # corpus has near-dups
    assert 0 < out["after_quality"] <= out["after_near_dedup"]
    assert out["composition_rows"] > 0
    assert len(out["bm25_top5"]) == 5
    assert out["packed_bins"] >= 1


def test_marketplace_analytics_report(spark):
    """examples/marketplace_analytics.py: the OLAP report end to end —
    Gini in (0,1), ABC classes partition the 25 brands, RFM segments and
    basket pairs non-empty, regional revenue positive."""
    import marketplace_analytics

    out = marketplace_analytics.run(spark, "/root/testdata/sf0.001")
    assert 0.0 < out["revenue_gini"] < 1.0
    assert sum(out["abc_counts"].values()) == 25
    assert set(out["abc_counts"]) <= {"A", "B", "C"}
    assert len(out["top_rfm_segments"]) == 5
    for (r, f, m), n in out["top_rfm_segments"]:
        assert 1 <= r <= 5 and 1 <= f <= 5 and 1 <= m <= 5 and n > 0
    assert len(out["top_brand_pairs"]) == 3
    assert out["top_brand_pairs"][0][2] >= out["top_brand_pairs"][-1][2]
    assert out["top_nation"][1] > 0


def test_training_frame_temporal_wall_and_coverage(spark):
    from ml_data_pipeline_spark.queries import pipe_training_frame
    from tests.conftest import SF_SMALL

    rows = pipe_training_frame(spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        # pre-cutoff features only: the wall means these are never negative
        assert r["days_since_last"] >= 1  # strictly before the cutoff
        assert r["n_purchases"] >= 0 and r["purchase_value"] >= 0.0
        assert r["churned"] in (True, False)
    # independent label recomputation: churned <=> no event in the horizon
    from pyspark.sql import functions as F

    from ml_data_pipeline_spark.catalog import load_table

    ev = load_table(spark, SF_SMALL, "events")
    future_users = {
        r["user_id"]
        for r in ev.where(
            (F.col("ts") >= F.lit("2024-01-20").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-27").cast("timestamp"))
        )
        .select("user_id")
        .distinct()
        .collect()
    }
    for r in rows:
        assert r["churned"] == (r["user_id"] not in future_users)
