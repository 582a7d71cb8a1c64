"""Prompt engineering for zero-shot CXR classification.

All four prompt families of the reference (SURVEY.md §2.6):

- prediction prompts  "This chest X-ray shows {d}." with the Normal special
  case (0425/disease_analysis.py:152-208 get_prediction_text_features)
- basic prompts       "a chest x-ray of {d.lower()}" (0426/load_model.py:6-33)
- showing prompts     "This is a chest X-ray showing {d}." (02 nb cells 36/41)
- rich prompts        frequency- and primacy-conditioned template banks from
  the disease distribution (0425/disease_analysis.py:12-115)
- findings prompts    per-disease templates embedding report Findings text
  (0425/disease_analysis.py:412-447)
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import pandas as pd


def analyze_disease_distribution(df: pd.DataFrame) -> pd.DataFrame:
    """Per-disease stats from the semicolon-separated Problems column:
    total_count, first_position_count, percentage_as_first, frequency."""
    stats: Dict[str, Dict[str, int]] = {}
    for problems in df.get("Problems", pd.Series(dtype=str)):
        if not isinstance(problems, str) or pd.isna(problems):
            continue
        diseases = [d.strip() for d in problems.split(";")]
        for pos, disease in enumerate(diseases):
            entry = stats.setdefault(
                disease, {"total_count": 0, "first_position_count": 0}
            )
            entry["total_count"] += 1
            if pos == 0:
                entry["first_position_count"] += 1
    out = pd.DataFrame.from_dict(stats, orient="index")
    if out.empty:
        return pd.DataFrame(
            columns=["total_count", "first_position_count",
                     "percentage_as_first", "frequency"]
        )
    out["percentage_as_first"] = (
        out["first_position_count"] / out["total_count"] * 100.0
    )
    out["frequency"] = out["total_count"]
    return out


def create_rich_prompts(disease_stats: pd.DataFrame) -> Dict[str, List[str]]:
    """5 base templates + frequency-conditioned (>10 / >5 / else) +
    primacy-conditioned (>80% / >50% / else) templates per disease."""
    prompts: Dict[str, List[str]] = {}
    for disease, stats in disease_stats.iterrows():
        t = [
            f"This chest X-ray shows {disease}.",
            f"The radiological findings indicate {disease}.",
            f"The image reveals characteristics of {disease}.",
            f"Diagnostic features of {disease} are present.",
            f"The X-ray demonstrates {disease}.",
        ]
        freq = stats["frequency"]
        if freq > 10:
            t += [
                f"This is a typical case of {disease}.",
                f"Clear radiological signs of {disease} are visible.",
                f"The X-ray shows classic features of {disease}.",
            ]
        elif freq > 5:
            t += [
                f"This X-ray exhibits features consistent with {disease}.",
                f"Radiological patterns suggest {disease}.",
            ]
        else:
            t += [
                f"This X-ray shows possible signs of {disease}.",
                f"Some features in this X-ray may indicate {disease}.",
            ]
        primacy = stats["percentage_as_first"]
        if primacy > 80:
            t += [
                f"The primary finding in this chest X-ray is {disease}.",
                f"This X-ray primarily shows {disease}.",
            ]
        elif primacy > 50:
            t += [
                f"One of the main findings in this X-ray is {disease}.",
                f"This X-ray shows significant evidence of {disease}.",
            ]
        else:
            t += [
                f"Among other findings, this X-ray shows {disease}.",
                f"This X-ray reveals {disease} as one of multiple conditions.",
            ]
        prompts[disease] = t
    return prompts


def disease_cooccurrence(df: pd.DataFrame) -> pd.DataFrame:
    """Symmetric disease co-occurrence counts from the Problems column
    (0425/disease_analysis.py:268-289 get_disease_cooccurrence)."""
    from collections import Counter
    from itertools import permutations

    counts: Counter = Counter()
    names: set = set()
    for problems in df.get("Problems", pd.Series(dtype=str)).dropna():
        diseases = [d.strip() for d in str(problems).split(";")]
        names.update(diseases)
        for a, b in permutations(set(diseases), 2):
            counts[(a, b)] += 1
    order = sorted(names)
    out = pd.DataFrame(0, index=order, columns=order)
    for (a, b), n in counts.items():
        out.loc[a, b] = n
    return out


def create_prediction_prompts(diseases: Sequence[str]) -> List[str]:
    return [
        "This is a normal chest X-ray without any significant findings."
        if d == "Normal"
        else f"This chest X-ray shows {d}."
        for d in diseases
    ]


def create_basic_prompts(diseases: Sequence[str]) -> List[str]:
    return [f"a chest x-ray of {d.lower()}" for d in diseases]


def create_showing_prompts(diseases: Sequence[str]) -> List[str]:
    return [f"This is a chest X-ray showing {d}." for d in diseases]


def create_enhanced_prompts_with_findings(
    df: pd.DataFrame,
    problems_col: str = "Problems",
    findings_col: str = "Findings",
) -> Dict[str, List[str]]:
    """Per-disease templates embedding each report's Findings text."""
    prompts: Dict[str, List[str]] = {}
    for _, row in df.iterrows():
        if pd.isna(row.get(problems_col)) or pd.isna(row.get(findings_col)):
            continue
        findings = str(row[findings_col]).strip()
        for disease in (d.strip() for d in str(row[problems_col]).split(";")):
            prompts.setdefault(disease, []).extend([
                f"This chest X-ray shows {disease}.",
                f"The radiological findings indicate {disease}, specifically: {findings}",
                f"Based on the following observations: {findings}, this X-ray demonstrates {disease}.",
                f"The X-ray reveals {disease}, characterized by: {findings}",
                f"Diagnostic features seen in this X-ray include: {findings}, indicating {disease}.",
            ])
    return prompts


def prompts_for_family(
    family: str, diseases: Sequence[str], df: pd.DataFrame | None = None
) -> Dict[str, List[str]]:
    """Uniform access: disease → list of prompts."""
    if family == "prediction":
        return {d: [p] for d, p in zip(diseases, create_prediction_prompts(diseases))}
    if family == "basic":
        return {d: [p] for d, p in zip(diseases, create_basic_prompts(diseases))}
    if family == "showing":
        return {d: [p] for d, p in zip(diseases, create_showing_prompts(diseases))}
    if family == "rich":
        if df is None:
            raise ValueError("rich prompts need the reports dataframe")
        stats = analyze_disease_distribution(df)
        rich = create_rich_prompts(stats)
        return {
            d: rich.get(d, [f"This is a chest X-ray showing {d}."])
            for d in diseases
        }
    if family == "findings":
        if df is None:
            raise ValueError("findings prompts need the reports dataframe")
        enh = create_enhanced_prompts_with_findings(df)
        return {
            d: enh.get(d, [f"This is a chest X-ray showing {d}."])
            for d in diseases
        }
    raise ValueError(f"unknown prompt family {family!r}")
