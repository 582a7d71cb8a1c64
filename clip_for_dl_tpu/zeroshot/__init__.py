from .driver import run_dynamic_threshold_eval, run_zero_shot_eval
from .engine import ZeroShotEngine, encode_prompt_bank
from .predict import (
    adjust_predictions_by_cooccurrence,
    frequency_thresholds,
    merge_views_union_max,
    merge_views_weighted,
    predictions_to_matrix,
    sigmoid_predictions,
    unique_problem_labels,
    softmax_topk_predictions,
)
from .prompts import (
    analyze_disease_distribution,
    create_basic_prompts,
    create_enhanced_prompts_with_findings,
    create_prediction_prompts,
    create_rich_prompts,
    create_showing_prompts,
    disease_cooccurrence,
    prompts_for_family,
)
from .thresholds import (
    calibration_split,
    search_threshold,
    search_thresholds,
    view_max_scores,
)

__all__ = [
    "run_dynamic_threshold_eval",
    "run_zero_shot_eval",
    "ZeroShotEngine",
    "encode_prompt_bank",
    "adjust_predictions_by_cooccurrence",
    "frequency_thresholds",
    "unique_problem_labels",
    "merge_views_union_max",
    "merge_views_weighted",
    "predictions_to_matrix",
    "sigmoid_predictions",
    "softmax_topk_predictions",
    "analyze_disease_distribution",
    "create_basic_prompts",
    "create_enhanced_prompts_with_findings",
    "create_prediction_prompts",
    "create_rich_prompts",
    "create_showing_prompts",
    "disease_cooccurrence",
    "prompts_for_family",
    "calibration_split",
    "search_threshold",
    "search_thresholds",
    "view_max_scores",
]
