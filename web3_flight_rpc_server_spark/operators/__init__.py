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
