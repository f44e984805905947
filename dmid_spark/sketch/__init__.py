from .hll import (  # noqa: F401
    hll_registers,
    hll_estimate,
    hll_distinct_counts,
    hll_pairwise_overlap,
    merge_registers,
)
from .cms import cms_build, cms_merge, cms_estimate  # noqa: F401
from .bloom import bloom_bits, bloom_might_contain, bloom_fp_rate  # noqa: F401
from .quantiles import group_quantiles  # noqa: F401
