from .scan import (  # noqa: F401
    TANIMOTO,
    TVERSKY,
    common_bits,
    exact_div,
    popcount_rows_np,
    score_batch,
    scores_np,
    similarity_from_counts,
)
from .fold import fold_bits, fold_words, overfetch_count, round_fold_factor  # noqa: F401
from .topk import count_above, exact_topk, merge_topk, topk_with_cutoff  # noqa: F401
