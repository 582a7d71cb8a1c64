"""Label-extraction parity against the reference's shipped output CSV."""

import os

import numpy as np
import pandas as pd
import pytest

from clip_for_dl_tpu.core.config import DISEASE_LABELS
from clip_for_dl_tpu.data.labels import (
    FINAL_LABELS,
    classify_term,
    extract_labels,
    label_matrix,
    label_reports,
    split_unlabeled,
    term_frequency_table,
)

RAW = "/root/reference/00_data/indiana_reports.csv"
GOLD = "/root/reference/01_preprocess_data/indiana_reports_labeled.csv"

needs_data = pytest.mark.skipif(
    not (os.path.exists(RAW) and os.path.exists(GOLD)),
    reason="Indiana CXR reference CSVs not available",
)


def test_extract_labels_unit():
    assert extract_labels("normal") == ""
    assert extract_labels(float("nan")) == ""
    assert extract_labels("Cardiomegaly/borderline;Pulmonary Artery") == "Cardiomegaly"
    got = set(extract_labels("Bullous Emphysema;Airspace Disease").split(", "))
    assert got == {"Emphysema", "Consolidation"}
    assert extract_labels("Tuberculosis") == ""  # not in the final 15


def test_classify_term():
    assert classify_term("Pneumonia") == "Disease"
    assert classify_term("Lung") == "Anatomical Structure"
    assert classify_term("Opacity") == "Uncategorized"


@needs_data
def test_full_parity_with_reference_csv():
    ours = label_reports(pd.read_csv(RAW))
    gold = pd.read_csv(GOLD)
    assert list(ours.columns) == list(gold.columns)
    assert len(ours) == len(gold) == 3851
    for col in DISEASE_LABELS:
        np.testing.assert_array_equal(
            ours[col].to_numpy(), gold[col].to_numpy(), err_msg=col
        )
    # extracted_labels strings may be order-permuted sets; compare as sets
    for a, b in zip(ours["extracted_labels"].fillna(""),
                    gold["extracted_labels"].fillna("")):
        assert (set(a.split(", ")) if a else set()) == (
            set(b.split(", ")) if b else set()
        )


@needs_data
def test_unlabeled_split_count():
    labeled = label_reports(pd.read_csv(RAW))
    with_label, unlabeled = split_unlabeled(labeled)
    assert len(unlabeled) == 1154  # 01 nb cell 10 output
    assert len(with_label) == 3851 - 1154


@needs_data
def test_term_frequency_table():
    tbl = term_frequency_table(pd.read_csv(RAW))
    assert set(tbl.columns) == {"Term", "Frequency", "Category"}
    assert (tbl["Frequency"].diff().dropna() <= 0).all()  # sorted desc


def test_label_matrix_shape():
    df = pd.DataFrame({
        "Problems": ["normal", "Cardiomegaly"],
    })
    lm = label_matrix(label_reports(df))
    assert lm.shape == (2, 16)
    assert lm[0, -1] == 1.0  # Normal
    assert lm[1, 0] == 1.0  # Cardiomegaly first column


@needs_data
def test_rich_prompts_on_real_distribution():
    """Rich prompt banks built from the real Problems distribution."""
    import pandas as pd

    from clip_for_dl_tpu.core.config import DISEASE_LABELS
    from clip_for_dl_tpu.zeroshot import (
        analyze_disease_distribution,
        create_rich_prompts,
        prompts_for_family,
    )

    df = pd.read_csv(RAW)
    stats = analyze_disease_distribution(df)
    assert stats.loc["Cardiomegaly", "frequency"] > 100
    prompts = create_rich_prompts(stats)
    # high-frequency disease gets the 'typical case' templates
    assert any("typical case" in t for t in prompts["Cardiomegaly"])
    fam = prompts_for_family("rich", DISEASE_LABELS, df)
    assert set(fam) == set(DISEASE_LABELS)
    assert all(len(v) >= 1 for v in fam.values())
