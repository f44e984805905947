from .ann import (  # noqa: F401
    brute_force_near_duplicates,
    brute_force_topk,
    cosine_near_duplicates,
    ivf_build,
    ivf_recall_at_k,
    ivf_topk,
)
from .kmeans import (  # noqa: F401
    KMeansStats,
    cluster_balanced_sample,
    kmeans,
)
from .pca import (  # noqa: F401
    PcaModel,
    covariance_stats,
    pca_fit,
    pca_project,
    semantic_dedup,
)
from .pq import (  # noqa: F401
    PQStats,
    adc_lut,
    ivfpq_build,
    ivfpq_topk,
    pq_adc_topk,
    pq_encode,
    pq_train,
)
from .quant import (  # noqa: F401
    QuantModel,
    quant_decode,
    quant_encode,
    quant_error_stats,
    quant_fit,
)
from .rplsh import (  # noqa: F401
    rp_lsh_candidates,
    rp_near_duplicates,
    rp_signatures,
)
from .fuse import rank_by, rrf_fuse  # noqa: F401
