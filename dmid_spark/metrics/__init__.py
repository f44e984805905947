from .ari import adjusted_rand_index  # noqa: F401
from .conductance import community_conductance  # noqa: F401
from .f1 import avg_f1, best_match_f1, cover_f1  # noqa: F401
from .goodness import community_goodness  # noqa: F401
from .omega import omega_index  # noqa: F401
from .modularity import extended_modularity, extended_modularity_npnb08  # noqa: F401
from .nmi import overlapping_nmi  # noqa: F401
from .spearman import spearman_degree_correlation  # noqa: F401
from .cover_ops import (  # noqa: F401
    community_sizes,
    filter_cover_threshold,
    normalize_cover_rows,
)
