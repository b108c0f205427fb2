from .asof import asof_join, asof_join_pandas  # noqa: F401
from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from .ivf import ivf_topk  # noqa: F401
from .similarity import cosine_topk, rp_lsh_neardup_pairs  # noqa: F401
from .skew import salted_agg  # noqa: F401
from .winnowing import fingerprint_overlap_pairs, winnow_fingerprints  # noqa: F401
from .heavy_hitters import (  # noqa: F401
    build_topk_summaries,
    guaranteed_above,
    merge_topk,
)
from .histograms import (  # noqa: F401
    build_histograms,
    merge_histograms,
    percentile_estimate,
)
from .normalize import normalize_documents, normalize_text  # noqa: F401
from .profile import profile_drift, profile_table  # noqa: F401
from .sketches import (  # noqa: F401
    build_distinct_sketches,
    compact_sketches,
    rollup_distinct,
)
from .vocab import (  # noqa: F401
    build_vocabulary,
    oov_rate,
    unigram_logprob_score,
)
from .sequencing import funnel_reach_times, sequence_funnel  # noqa: F401
from .sequencing import (  # noqa: F401
    retention_matrix,
    rolling_zscore,
    transition_matrix,
)
