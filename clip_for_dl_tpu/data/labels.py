"""Offline label extraction for the Indiana University CXR reports.

Reproduces the reference's labeling pass (01_datapreprocess.ipynb cells 1-10)
as a pure-pandas tool: parse the semicolon-separated ``Problems`` column,
take the main term before any slash, normalize synonyms, and emit one binary
column per disease plus ``Normal``. Output is validated byte-for-byte against
the reference's shipped ``indiana_reports_labeled.csv`` (3851×25) in
tests/test_labels.py.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

from ..core.config import DISEASE_LABELS

# 15 disease columns (DISEASE_LABELS minus the appended "Normal").
FINAL_LABELS: Tuple[str, ...] = DISEASE_LABELS[:-1]

# Synonym normalization (01_datapreprocess.ipynb cell 5 label_mapping).
LABEL_MAPPING: Dict[str, str] = {
    "Bullous Emphysema": "Emphysema",
    "Pulmonary Fibrosis": "Fibrosis",
    "Hernia, Hiatal": "Hernia",
    "Pulmonary Emphysema": "Emphysema",
    "Calcified Granuloma": "Granuloma",
    "Granulomatous Disease": "Granuloma",
    "Airspace Disease": "Consolidation",
}

# Term taxonomy used by the exploratory classification pass (cell 1).
DISEASE_KEYWORDS = frozenset({
    "Cardiomegaly", "Pulmonary Atelectasis", "Bullous Emphysema",
    "Pulmonary Fibrosis", "Pneumonia", "Tuberculosis",
    "Chronic Obstructive Pulmonary Disease", "COPD", "Emphysema", "Neoplasm",
    "Hernia", "Edema", "Infiltration", "Mass", "Nodule", "Consolidation",
    "Fibrosis", "Pleural Thickening", "Effusion", "Pleural Effusion",
    "Pneumothorax", "Pulmonary Edema", "Hernia, Hiatal", "Infiltrate",
    "Thickening", "Calcified Granuloma", "Granulomatous Disease",
    "Airspace Disease",
})

STRUCTURE_KEYWORDS = frozenset({
    "Lung", "Pulmonary Artery", "Thoracic Vertebrae", "Diaphragm", "Heart",
    "Rib", "Chest Wall", "Mediastinum", "Trachea", "Pleura",
})


def classify_term(term: str) -> str:
    """Disease / Anatomical Structure / Uncategorized taxonomy."""
    if term in DISEASE_KEYWORDS:
        return "Disease"
    if term in STRUCTURE_KEYWORDS:
        return "Anatomical Structure"
    return "Uncategorized"


def main_terms(problems: str) -> List[str]:
    """Split 'Problems' on ';', keep the main term before any '/'."""
    return [part.strip().split("/")[0] for part in problems.split(";")]


def term_frequency_table(reports: pd.DataFrame) -> pd.DataFrame:
    """Frequency + category of every main term (excluding 'normal' rows)."""
    series = reports["Problems"].dropna()
    series = series[series.str.lower() != "normal"]
    counts = Counter(
        t for problems in series for t in (s.strip() for s in main_terms(problems))
    )
    df = pd.DataFrame(sorted(counts.items(), key=lambda kv: -kv[1]),
                      columns=["Term", "Frequency"])
    df["Category"] = df["Term"].map(classify_term)
    return df


def extract_labels(problem_str) -> str:
    """One row's normalized disease-label set as a comma-joined string."""
    if pd.isna(problem_str) or str(problem_str).lower() == "normal":
        return ""
    mapped = (LABEL_MAPPING.get(t, t) for t in main_terms(str(problem_str)))
    found = {m for m in mapped if m in FINAL_LABELS}
    return ", ".join(found) if found else ""


def label_reports(reports: pd.DataFrame) -> pd.DataFrame:
    """reports df → df with extracted_labels + 15 binary disease columns +
    Normal. Column order matches the reference's output CSV."""
    df = reports.copy()
    df["extracted_labels"] = df["Problems"].apply(extract_labels)
    extracted_sets = df["extracted_labels"].str.split(", ").apply(
        lambda xs: set(xs) if xs != [""] else set()
    )
    for label in FINAL_LABELS:
        df[label] = extracted_sets.apply(lambda s: 1 if label in s else 0)
    df["Normal"] = np.where(
        df["Problems"].astype(str).str.lower() == "normal", 1, 0
    )
    return df


def split_unlabeled(labeled: pd.DataFrame) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """(labeled_rows, unlabeled_rows) by any-label-set (cells 9-10)."""
    cols = list(DISEASE_LABELS)
    mask = labeled[cols].sum(axis=1) > 0
    return labeled[mask], labeled[~mask]


def label_matrix(df: pd.DataFrame) -> np.ndarray:
    """[N, 16] float32 multi-hot matrix in DISEASE_LABELS order."""
    return df[list(DISEASE_LABELS)].to_numpy(np.float32)


def prepare_labeled_csv(
    reports_csv: str, out_csv: str, unlabeled_csv: str | None = None
) -> pd.DataFrame:
    """CLI entrypoint body: read raw reports, label, write CSV(s)."""
    reports = pd.read_csv(reports_csv)
    labeled = label_reports(reports)
    labeled.to_csv(out_csv, index=False)
    if unlabeled_csv:
        _, unlabeled = split_unlabeled(labeled)
        unlabeled.to_csv(unlabeled_csv, index=False)
    return labeled
