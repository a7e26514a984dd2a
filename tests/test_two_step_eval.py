"""evaluate-detector / evaluate-translator analogs with real ground truth:
the two-step pipeline must REDUCE CER (the reference's anagram-hash
baseline famously increased it) with a high-precision, high-recall
detector and near-zero false corrections on the synthetic corpus."""

import pytest

from sbb_ocr_postcorrection_spark.datagen import generate_pages, pages_to_arrow
from sbb_ocr_postcorrection_spark.operators.evaluation import (
    two_step_eval,
    two_step_summary,
)


@pytest.fixture(scope="module")
def summary(spark):
    pages = spark.createDataFrame(
        pages_to_arrow(generate_pages(120, seed=33, noise_rate=0.12)).to_pandas()
    )
    return two_step_summary(two_step_eval(pages)).collect()[0]


def test_correction_reduces_cer(summary):
    assert summary["avg_cer_before"] > 0.01  # noise was actually injected
    assert summary["avg_cer_after"] < summary["avg_cer_before"] / 5
    assert summary["avg_cer_after"] < 0.005


def test_detector_quality(summary):
    assert summary["detector_precision"] > 0.9
    assert summary["detector_recall"] > 0.9
    assert summary["detector_f1"] > 0.9


def test_false_correction_ratio_low(summary):
    # corrections applied to already-correct tokens (the reference's
    # false-corrections metric, cli_correct.py:533-625)
    assert summary["false_correction_ratio"] < 0.1


def test_docs_counted(summary):
    assert summary["docs"] == 120
