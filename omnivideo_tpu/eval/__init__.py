from .vqa import (  # noqa: F401
    ADAPTERS,
    adapt_rows,
    aggregate,
    build_prompt,
    evaluate,
    mme_scores,
    normalize_answer,
    pope_metrics,
    score_row,
)
