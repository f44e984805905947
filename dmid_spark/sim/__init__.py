from .ann import (  # noqa: F401
    brute_force_near_duplicates,
    brute_force_topk,
    cosine_near_duplicates,
    ivf_build,
    ivf_recall_at_k,
    ivf_topk,
)
from .pca import (  # noqa: F401
    PcaModel,
    covariance_stats,
    pca_fit,
    pca_project,
    semantic_dedup,
)
from .rplsh import (  # noqa: F401
    rp_lsh_candidates,
    rp_near_duplicates,
    rp_signatures,
)
